"""spark-submit entry point: build the inverted index.

Usage:
  spark-submit --py-files ivory_spark.zip tools/run_index.py \
      --corpus /path/corpus.parquet --index-root /path/index \
      [--positional] [--min-df 1] [--salt-threshold 250000] \
      [--n-shards 32] [--partitions N] [--tokenizer code_v1] [--validate]

(The analogue of Ivory's `PreprocessCollection` + `BuildIndex` drivers,
app/PreprocessCollection.java:92-207 / app/BuildIndex.java:50-128.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--index-root", required=True)
    p.add_argument("--positional", action="store_true")
    p.add_argument("--min-df", type=int, default=1)
    p.add_argument("--max-df", type=int, default=None)
    p.add_argument("--salt-threshold", type=int, default=250_000)
    p.add_argument("--n-shards", type=int, default=32)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument(
        "--tokenizer", default="code_v1",
        help="analysis chain from the tokenizer registry: code_v1, "
        "galago_en/de, lucene_es/fr/cs/ar/tr, cjk_bigram, nl_nostem",
    )
    p.add_argument("--validate", action="store_true")
    args = p.parse_args()

    from ivory_spark.index.build import IndexConfig, build_index
    from ivory_spark.session import get_spark

    spark = get_spark("ivory-build")
    cfg = IndexConfig(
        min_df=args.min_df, max_df=args.max_df, salt_threshold=args.salt_threshold,
        n_shards=args.n_shards, partitions=args.partitions, positional=args.positional,
        tokenizer=args.tokenizer,
    )
    props = build_index(spark, args.corpus, args.index_root, cfg)
    if args.validate:
        from ivory_spark.index.reader import open_index
        from ivory_spark.plans.validate import validate_index

        checks = validate_index(spark, open_index(spark, args.index_root))
        props = {**props, "validation": checks}
    print(json.dumps(props))


if __name__ == "__main__":
    main()
