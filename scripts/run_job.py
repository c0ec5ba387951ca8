"""spark-submit entry point: transcripts parquet/Iceberg path in,
checkpointed triple store out (the S11 predictions.tab analog).

Run via scripts/submit.sh (packages the engine with --py-files); the
SparkSession comes from the cluster submit conf, not the local factory.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    from stanford_relation_extractor_spark.plans.pipeline import run_pipeline

    # sf_dir doubles as the dimension-table root in the sandbox corpus;
    # on a real deployment the alias dictionary/gazetteers are their own
    # catalog tables.
    result = run_pipeline(spark, inp, out)
    print({k: (m or {}).get("row_count") for k, m in result["manifests"].items()})


if __name__ == "__main__":
    main()
