"""spark-submit entry point — build an index / serve queries from the CLI.

The north rule's deployment shape: the whole pipeline runs via

  zip -r cantine_spark.zip cantine_spark
  spark-submit --py-files cantine_spark.zip scripts/cantine_submit.py \
      build --corpus s3://bucket/corpus_parquet --index s3://bucket/idx

  spark-submit --py-files cantine_spark.zip scripts/cantine_submit.py \
      search --index s3://bucket/idx --query '{"fulltext": "+parser -lex"}'

Under spark-submit the session comes from the submitted conf (master,
executors, memory are the cluster's business); `--local N` forces the
sandbox's tuned local[N] session instead (bench/test parity).

The corpus parquet must have the input_hint schema:
(repo string, path string, commit string, lang string, content string).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # under spark-submit the --py-files zip provides the package;
    import cantine_spark  # noqa: F401
except ModuleNotFoundError:  # bare `python scripts/cantine_submit.py`
    # puts scripts/ (not the repo root) on sys.path — add the root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(args, serving: bool = False):
    """serving=True tunes the context for a long-lived query service:
    FAIR scheduling (concurrent queries are many small jobs; FIFO queues
    them ~2× slower at 4 clients — bench.py measurement) and reused Python
    workers (kernel tasks are tiny and identical). Batch builds keep the
    defaults (fresh workers; see session.py)."""
    extra = ({"spark.scheduler.mode": "FAIR",
              "spark.python.worker.reuse": "true"} if serving else {})
    if args.local:
        from cantine_spark.session import get_spark
        return get_spark("cantine-submit", cores=args.local,
                         shuffle_partitions=args.local, extra_conf=extra)
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.appName("cantine-submit")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.adaptive.enabled", "true"))
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()


def cmd_build(args) -> int:
    from cantine_spark.build.builder import build_index
    from cantine_spark.corpus import with_doc_ids
    spark = _session(args)
    corpus = spark.read.parquet(args.corpus)
    manifest = build_index(spark,
                           with_doc_ids(corpus, order=args.doc_order),
                           args.index, force=args.force)
    print(json.dumps({"n_docs": manifest["n_docs"],
                      "stages_run": manifest["stages_run"],
                      "stages_skipped": manifest["stages_skipped"],
                      "metrics": manifest["metrics"]}, default=str))
    return 0


def cmd_search(args) -> int:
    from cantine_spark.api import BadRequest, SearchEngine
    from cantine_spark.index import IndexReader
    spark = _session(args)
    engine = SearchEngine(IndexReader(spark, args.index),
                          agg_threshold=args.agg_threshold)
    try:
        query = json.loads(args.query)
    except json.JSONDecodeError as e:
        print(f"bad --query JSON: {e}", file=sys.stderr)
        return 2
    try:
        res = engine.search(query)
    except BadRequest as e:           # the 400 analog
        print(f"bad request: {e}", file=sys.stderr)
        return 2
    print(json.dumps({
        "total_found": res.total_found,
        "items": res.items,
        "next": res.next,
        "agg": ({k: [vars(s) for s in v] for k, v in res.agg.items()}
                if res.agg else None),
    }, default=str))
    return 0


def cmd_serve(args) -> int:
    """Long-lived serving over a streaming index root: poll
    generations.json, compact NEW generations into a tier + swap the
    engine (the reference's actix server + reader refresh,
    main.rs:235-245). With --port, answers POST /search + GET /info over
    HTTP (the actix surface); without, runs the in-process poll loop."""
    from cantine_spark.serve import IndexServer
    spark = _session(args, serving=True)
    server = IndexServer(spark, args.index_root,
                         agg_threshold=args.agg_threshold)
    print(json.dumps({"serving": args.index_root,
                      "n_docs": server.engine.reader.num_docs}), flush=True)
    if args.port is not None:
        import time
        from cantine_spark.httpserve import SearchHTTPServer
        with SearchHTTPServer(server, port=args.port,
                              poll_seconds=args.poll,
                              batch_window_ms=args.batch_window_ms,
                              batch_max=args.batch_max) as http:
            print(json.dumps({"listening": http.url}), flush=True)
            polls = 0
            while args.max_polls is None or polls < args.max_polls:
                time.sleep(args.poll)
                polls += 1
        return 0
    server.serve_forever(poll_seconds=args.poll,
                         max_iterations=args.max_polls)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cantine_submit")
    p.add_argument("--local", type=int, default=0,
                   help="force a tuned local[N] session (sandbox mode)")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build", help="build/refresh an index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--doc-order", choices=["identity", "impact"],
                   default="identity",
                   help="doc_id layout: ingest order, or impact-ordered "
                        "(striped max-term-impact prior) for hot-term "
                        "block-max pruning")
    b.add_argument("--force", action="store_true")
    b.set_defaults(fn=cmd_build)
    s = sub.add_parser("search", help="run one SearchQuery JSON")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--agg-threshold", type=int, default=None)
    s.set_defaults(fn=cmd_search)
    v = sub.add_parser("serve", help="serve a streaming index root, "
                                     "refreshing on new generations")
    v.add_argument("--index-root", required=True)
    v.add_argument("--port", type=int, default=None,
                   help="serve POST /search + GET /info over HTTP "
                        "(0 = ephemeral port)")
    v.add_argument("--poll", type=float, default=5.0)
    v.add_argument("--max-polls", type=int, default=None,
                   help="bound the loop (smoke tests); default: forever")
    v.add_argument("--agg-threshold", type=int, default=None)
    v.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="micro-batch concurrent requests arriving within "
                        "this window into one kernel job (0 = per-request "
                        "dispatch)")
    v.add_argument("--batch-max", type=int, default=16,
                   help="max requests per micro-batch")
    v.set_defaults(fn=cmd_serve)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
