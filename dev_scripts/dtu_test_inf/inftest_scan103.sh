#!/bin/bash
# DTU per-scene inference test for scan103 (reference
# dev_scripts/dtu_test_inf/inftest_scan103.sh). See inftest_common.sh.
name='inftest_scan103'
scan="scan103"
geo_cnsst_num=4
depth_conf_thresh=0.9
source "$(dirname "$0")/inftest_common.sh"
