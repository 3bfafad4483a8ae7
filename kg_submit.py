#!/usr/bin/env python
"""spark-submit entry point for the KG pipeline.

    spark-submit --master ... --py-files x5_ner_spark.zip kg_submit.py \
        [--pages <parquet>] [--n N] [--out DIR] [--buckets K]

A top-level launcher is required because spark-submit executes the script as
__main__ (no package context for relative imports); the package itself ships
via --py-files.
"""

from x5_ner_spark.pipeline.runner import main

if __name__ == "__main__":
    main()
