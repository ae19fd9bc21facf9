#!/bin/bash
# Sequential dataset regeneration on the (single-client) TPU.
cd /root/repo
python tools/generate_problems.py kuka14 3000 20240816 --verify=425 >> /tmp/gen_kuka14.log 2>&1
python tools/generate_problems.py snake7 3000 20240816 --verify=250 > /tmp/gen_snake.log 2>&1
python tools/generate_problems.py kuka13 3000 20240816 --verify=250 > /tmp/gen_kuka13.log 2>&1
echo ALL_DATASETS_DONE > /tmp/gen_chain_status.log
