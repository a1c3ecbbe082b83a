"""spark-submit driver script: thin shim over dedup_spark.__main__.

    spark-submit --master local[8] --py-files dedup_spark.zip run_pipeline.py \
        --warehouse /tmp/wh --n-convs 2000
"""
import sys

from dedup_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
