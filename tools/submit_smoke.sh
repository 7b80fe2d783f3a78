#!/usr/bin/env bash
# End-to-end spark-submit smoke: package shipped via --py-files, native
# and Arrow-UDF query paths both executed (executor-side imports).
set -euo pipefail
cd "$(dirname "$0")/.."
tools/package.sh >/dev/null
JOB=$(mktemp /tmp/pcpt-submit-XXXX.py)
cat > "$JOB" <<'EOF'
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from privacy_crawler_parser_tokenizer_spark.queries import QUERIES
n1 = QUERIES["rule_hits"](spark, "/root/testdata/sf0.001").count()
n2 = QUERIES["sentence_pipeline"](spark, "/root/testdata/sf0.001").count()
assert n1 > 0 and n2 > 0
print(f"SUBMIT_OK native={n1} udf={n2}")
spark.stop()
EOF
spark-submit --master "local[4]" --conf spark.ui.enabled=false \
    --py-files dist/pcpt_spark.zip "$JOB" 2>/dev/null | grep SUBMIT_OK
rm -f "$JOB"
