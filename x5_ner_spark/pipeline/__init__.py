"""The KG-construction DAG (north rule):

pages → extract text → detect mentions → candidates → link → triples →
canonicalize (connected components) → graph node/edge tables + manifests.

Each stage is a ``run(spark_df, ...) -> DataFrame`` pure-plan function; the
driver (pipeline.runner) chains them and handles checkpoint-resume via
per-partition manifests.
"""
