#!/bin/bash
cd /root/repo
python tools/generate_prm.py kuka7 1000 >> /tmp/gen_prm2.log 2>&1
python tools/generate_prm.py ur5 500 >> /tmp/gen_prm2.log 2>&1
python tools/generate_prm.py kuka13 500 >> /tmp/gen_prm2.log 2>&1
python tools/generate_prm.py kuka14 500 >> /tmp/gen_prm2.log 2>&1
python tools/generate_prm.py snake7 300 >> /tmp/gen_prm2.log 2>&1
echo PRM_DONE > /tmp/prm_status.log
