"""spark-submit entry point: ltr feature extraction + greedy learning.

The analogue of Ivory's ltr apps (ltr/ExtractFeatures.java main,
ltr/GreedyLearn.java main, ltr/Rank.java main) as one CLI:

  # extract per-(query, judged doc) features to a reference-format TSV
  spark-submit --py-files ivory_spark.zip tools/run_ltr.py extract \
      --index-root /path/index --queries q.xml|q.jsonl --qrels qrels.txt \
      --out features.tsv [--model sd|fd|bm25] [--model-xml model.xml]

  # greedy feature learning on a feature file (driver-side numpy)
  python tools/run_ltr.py learn --features features.tsv --out model.json \
      [--metric ndcg|map|err] [--num-models 1] [--log] [--product] \
      [--quotient] [--prune-correlated 0.95]

  # score a feature file with a learned model (Rank semantics)
  python tools/run_ltr.py rank --features features.tsv --model model.json

qrels are TREC format 'qid 0 docid grade'; docids are resolved against
the index docmap (the DocnoMapping step of ExtractFeatures.java:215).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_queries(path: str) -> list[dict]:
    from ivory_spark.query.batch import parse_query_jsonl, parse_query_xml

    if path.endswith(".jsonl"):
        return parse_query_jsonl(path)
    with open(path) as f:
        return parse_query_xml(f.read())


def cmd_extract(args) -> None:
    from ivory_spark.functions.eval import parse_graded_qrels
    from ivory_spark.index.reader import open_index
    from ivory_spark.query.batch import parse_model_xml
    from ivory_spark.query.features import extract_features, features_to_instances
    from ivory_spark.query.mrf import MrfModel
    from ivory_spark.session import get_spark

    spark = get_spark("ivory-ltr", cores=args.cores)
    index = open_index(spark, args.index_root)
    queries = _load_queries(args.queries)
    graded = parse_graded_qrels(args.qrels)

    # docid -> docno via the docmap (ExtractFeatures.java:215)
    all_docids = sorted({d for js in graded.values() for d in js})
    de = index.docid_expr()
    id_rows = de.where(de["docid"].isin(all_docids)).collect()
    docno_of = {r["docid"]: r["docno"] for r in id_rows}
    qrels = {
        qid: {
            docno_of[d]: g for d, g in js.items() if d in docno_of
        }
        for qid, js in graded.items()
    }

    if args.model_xml:
        model = parse_model_xml(args.model_xml, args.model_id)
        models = {args.model_name or "m0": model}
    elif args.model in ("sd", "fd"):
        models = {args.model_name or args.model: MrfModel(dependence=args.model)}
    else:
        from ivory_spark.query.batch import Model

        models = {args.model_name or args.model: Model(scorer=args.model)}

    df = extract_features(spark, index, queries, qrels, models)
    inst = features_to_instances(df)
    inst.to_tsv(args.out)
    print(f"wrote {inst.n} instances x {len(inst.feature_names)} features to {args.out}")


def cmd_learn(args) -> None:
    from ivory_spark.ltr import Instances, greedy_learn

    inst = Instances.from_tsv(args.features)
    model, measure = greedy_learn(
        inst,
        metric=args.metric,
        num_models=args.num_models,
        log_features=args.log,
        product_features=args.product,
        quotient_features=args.quotient,
        prune_correlated=args.prune_correlated,
    )
    with open(args.out, "w") as f:
        f.write(model.to_json())
    names = [f.name for f in model.features]
    print(f"final {args.metric}={measure:.6f}; model: "
          + ", ".join(f"{n}:{w:.4f}" for n, w in zip(names, model.weights)))


def cmd_rank(args) -> None:
    from ivory_spark.ltr import Instances, LearnedModel

    inst = Instances.from_tsv(args.features)
    with open(args.model) as f:
        model = LearnedModel.from_json(f.read())
    scores = model.score(inst.features)
    for i in range(inst.n):  # Rank.java prints qid \t docid \t score
        print(f"{inst.qids[i]}\t{inst.docids[i]}\t{scores[i]}")


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract")
    e.add_argument("--index-root", required=True)
    e.add_argument("--queries", required=True)
    e.add_argument("--qrels", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--model", default="sd",
                   choices=["sd", "fd", "bm25", "dirichlet"])
    e.add_argument("--model-xml", default=None)
    e.add_argument("--model-id", default=None)
    e.add_argument("--model-name", default=None)
    e.add_argument("--cores", type=int, default=8)
    e.set_defaults(fn=cmd_extract)

    l = sub.add_parser("learn")
    l.add_argument("--features", required=True)
    l.add_argument("--out", required=True)
    l.add_argument("--metric", default="ndcg", choices=["ndcg", "map", "err"])
    l.add_argument("--num-models", type=int, default=1)
    l.add_argument("--log", action="store_true")
    l.add_argument("--product", action="store_true")
    l.add_argument("--quotient", action="store_true")
    l.add_argument("--prune-correlated", type=float, default=None)
    l.set_defaults(fn=cmd_learn)

    r = sub.add_parser("rank")
    r.add_argument("--features", required=True)
    r.add_argument("--model", required=True)
    r.set_defaults(fn=cmd_rank)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
