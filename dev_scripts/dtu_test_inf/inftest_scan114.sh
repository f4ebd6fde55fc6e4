#!/bin/bash
# DTU per-scene inference test for scan114 (reference
# dev_scripts/dtu_test_inf/inftest_scan114.sh). See inftest_common.sh.
name='inftest_scan114'
scan="scan114"
geo_cnsst_num=14
depth_conf_thresh=0.8
source "$(dirname "$0")/inftest_common.sh"
