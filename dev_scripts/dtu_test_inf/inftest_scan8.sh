#!/bin/bash
# DTU per-scene inference test for scan8 (reference
# dev_scripts/dtu_test_inf/inftest_scan8.sh). See inftest_common.sh.
name='inftest_scan8'
scan="scan8"
geo_cnsst_num=10
depth_conf_thresh=0.8
source "$(dirname "$0")/inftest_common.sh"
