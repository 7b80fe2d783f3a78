#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north rule:
# "launched via spark-submit --py-files on multi-executor clusters").
#
#   tools/package.sh                      -> dist/pcpt_spark.zip
#   spark-submit --py-files dist/pcpt_spark.zip your_job.py
#
# The zip contains the pure-Python package only; executors need nothing
# else (stdlib + numpy + pandas, all part of the PySpark runtime env).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pcpt_spark.zip
zip -qr dist/pcpt_spark.zip privacy_crawler_parser_tokenizer_spark \
    -x '*/__pycache__/*' -x '*.pyc'
echo "dist/pcpt_spark.zip ($(du -h dist/pcpt_spark.zip | cut -f1))"
