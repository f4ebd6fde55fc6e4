#!/bin/bash
# DTU per-scene inference test for scan21 (reference
# dev_scripts/dtu_test_inf/inftest_scan21.sh). See inftest_common.sh.
name='inftest_scan21'
scan="scan21"
geo_cnsst_num=9
depth_conf_thresh=0.8
source "$(dirname "$0")/inftest_common.sh"
