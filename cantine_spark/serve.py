"""Long-lived serving layer — the reader-refresh analog.

The reference runs an actix HTTP server holding a tantivy reader that is
refreshed so queries see newly committed segments (cantine/src/main.rs:235
builds the reader, :245 serves from it; tantivy's IndexReader reloads on
commit). Our deployment shape is a long-lived Spark application (the bench's
"serving" phase) watching a streaming index root:

  StreamingIndexer commits generations  →  generations.json grows
  IndexServer.maybe_refresh() notices   →  compacts to compacted_g<N>
                                        →  opens a NEW SearchEngine there
                                        →  swaps it in, closes the old one

The swap is blue/green: each refresh compacts into a fresh versioned
directory (never overwriting files a live engine may still scan), pins the
new tables (SearchEngine(pin_tables=True)), then unpins the old. Queries
between refreshes hit the pinned steady state the bench's p50 measures.

Compaction-per-refresh mirrors the reference's merge policy at our commit
granularity: generations are whole mini-indexes (not tantivy's in-RAM
segments), so "reader reload" = merge + reopen. A deployment ingesting very
frequently would batch refreshes with poll_seconds, exactly like tantivy's
default 'reload on commit, debounced'.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from cantine_spark.api import SearchEngine, SearchResult
from cantine_spark.index import IndexReader
from cantine_spark.streaming.incremental import StreamingIndexer


@dataclass
class IndexServer:
    spark: SparkSession
    index_root: str            # a StreamingIndexer root (generations.json)
    pin_tables: bool = True
    agg_threshold: int | None = None
    _engine: SearchEngine | None = field(default=None, init=False)
    _seen_gens: int = field(default=0, init=False)

    def __post_init__(self):
        self._indexer = StreamingIndexer(self.spark, self.index_root)
        self.maybe_refresh()

    # ------------------------------------------------------------ refresh
    def _gen_count(self) -> int:
        p = os.path.join(self.index_root, "generations.json")
        try:
            with open(p) as f:
                return len(json.load(f)["generations"])
        except (OSError, json.JSONDecodeError, KeyError):
            return 0

    def maybe_refresh(self) -> bool:
        """Reopen the index iff new generations landed since the last look.
        Returns True when a swap happened. Cheap when idle: one stat/read of
        generations.json, no Spark jobs."""
        n = self._gen_count()
        if n == self._seen_gens and self._engine is not None:
            return False
        if n == 0:
            return False  # nothing ingested yet; keep whatever we have
        dest = f"compacted_g{n:06d}"
        out = os.path.join(self.index_root, dest)
        if not os.path.exists(os.path.join(out, "manifest.json")):
            self._indexer.compact(dest=dest)
        old = self._engine
        self._engine = SearchEngine(IndexReader(self.spark, out),
                                    agg_threshold=self.agg_threshold,
                                    pin_tables=self.pin_tables)
        self._seen_gens = n
        if old is not None:
            old.close()  # unpin the previous index's cached tables
        return True

    # -------------------------------------------------------------- query
    @property
    def engine(self) -> SearchEngine:
        if self._engine is None:
            raise RuntimeError("no generations ingested yet")
        return self._engine

    def search(self, query: dict) -> SearchResult:
        return self.engine.search(query)

    # --------------------------------------------------------------- loop
    def serve_forever(self, poll_seconds: float = 5.0,
                      max_iterations: int | None = None) -> None:
        """Poll-and-refresh loop (the daemon shape for cantine_submit
        serve). max_iterations bounds the loop for tests/smoke runs."""
        i = 0
        while max_iterations is None or i < max_iterations:
            if self.maybe_refresh():
                m = self.engine.reader.manifest
                print(f"[serve] refreshed: {m.get('n_docs')} docs, "
                      f"{self._seen_gens} generations", flush=True)
            time.sleep(poll_seconds)
            i += 1
