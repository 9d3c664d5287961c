"""Streaming document admission: dedup-screened, exactly-once corpus
ingestion — the end-to-end loop an LLM-data ingestion service runs.

Per micro-batch of arriving documents:

1. intra-batch dedup — exact (md5, keep min doc_id) then near-dup
   (ngram_jaccard_pairs on the batch alone; batch-sized work);
2. corpus screen — survivors run through
   operators/dedup.incremental_dedup_verdict against the INCREMENTALLY
   MAINTAINED posting store (never a corpus rescan);
3. commit — admitted docs merge into the transactional corpus table
   (txn.TxnTable) in one atomic commit tagged (app, batch_id): a
   crash-replayed batch is skipped whole (exactly-once);
4. maintenance — the admitted docs' postings land in
   ``postings_dir/ingest_batch=<id>/`` and the full admission log
   (every verdict, kept or rejected, with the dup target) in
   ``log_dir/ingest_batch=<id>/``; both are per-batch OVERWRITES, so
   a replayed batch rewrites the same files instead of duplicating.

Scale notes (100 TB): every stage is batch-sized except the corpus
screen, which touches the corpus only through the posting store's
shingle equi-join.  The per-batch posting increments trade the
bucketed layout for idempotent appends; a deployment compacts them
into the bucketed table (Engine.materialize_postings /
sources.files.compact_parquet) on a maintenance cadence, exactly like
small-file compaction of any streaming sink.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

DOCS_SCHEMA = "doc_id long, text string, lang string, source string"

# Shingle-hash partition fan-out of the posting store: corpus reads in
# the screen prune to the batch's buckets (see incremental_jaccard_pairs'
# pruning contract).  At 100 TB you'd raise this (it bounds both the
# pruning granularity and the per-batch bucket-id collect).
N_SHINGLE_BUCKETS = 64

_APP = "doc_admission"

_META = "_admission_meta.json"


def _batch_tags(d: str) -> set[str]:
    """Partition-dir tag values under a store dir (empty if absent)."""
    if not os.path.isdir(d):
        return set()
    return {e.name.split("=", 1)[1] for e in os.scandir(d)
            if e.name.startswith("ingest_batch=")}


def store_bucket_mod(postings_dir: str) -> int | None:
    """The shingle-bucket modulus a posting store was WRITTEN with —
    persisted in `_admission_meta.json` on the store's first write
    (underscore prefix: invisible to Spark's file listing).  The
    modulus is a property of the stored s_bucket values: pruning with
    a different one silently hides corpus shingles (true dups would
    be admitted), so it must never be re-derived from the current
    constant.  Returns None for a flat (pre-bucketing / legacy)
    store; a meta-less dir that already has batch partitions is
    treated as flat and stamped so."""
    meta = os.path.join(postings_dir, _META)
    try:
        with open(meta) as fh:
            return json.load(fh)["s_bucket_mod"]
    except (FileNotFoundError, KeyError, ValueError):
        pass
    mod = None if _batch_tags(postings_dir) else N_SHINGLE_BUCKETS
    os.makedirs(postings_dir, exist_ok=True)
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"s_bucket_mod": mod}, fh)
    os.replace(tmp, meta)
    return mod


def _dedup_within_batch(batch: DataFrame, n: int, tau: float
                        ) -> tuple[DataFrame, list[DataFrame]]:
    """Exact + near-dup dedup INSIDE one batch: collapse repeated
    doc_ids (transport redelivery) deterministically, keep the min
    doc_id of every exact-hash group, then drop the LARGER doc of
    every near-dup pair.  Pair-drop keeps every doc that is not the
    larger of any pair — kept docs are pairwise non-near-dup (if two
    kept docs were a pair, the larger would have been dropped); docs
    linked only through a dropped middleman both stay, which is
    deliberately more conservative than a full connected-components
    collapse.

    Returns (survivors, cache_handles): the caller must unpersist the
    handles once its derived frames are materialized — a long-running
    stream would otherwise accumulate one cached posting frame per
    micro-batch."""
    from data_ingestion_challenge_spark.operators.dedup import (
        _postings, ngram_jaccard_pairs,
    )

    wid = Window.partitionBy("doc_id").orderBy(F.md5(col("text")))
    batch = (batch.withColumn("_r", F.row_number().over(wid))
             .where(col("_r") == 1).drop("_r"))
    w = Window.partitionBy(F.md5(col("text"))).orderBy("doc_id")
    exact = (batch.withColumn("_r", F.row_number().over(w))
             .where(col("_r") == 1).drop("_r"))
    bp = _postings(exact, n)
    near = ngram_jaccard_pairs(exact, n=n, tau=tau, posting=bp)
    drop = near.select(
        F.greatest("doc_a", "doc_b").alias("doc_id")).distinct()
    return exact.join(drop, "doc_id", "left_anti"), [bp]


def document_admission_sink(spark: SparkSession, table_path: str,
                            postings_dir: str, log_dir: str,
                            n_buckets: int = 32, n: int = 3,
                            tau: float = 0.8,
                            sizes_dir: str | None = None,
                            run_id: str | None = None):
    """Build the foreachBatch admission callback.  Returns
    (admit_fn, table): admit_fn(batch_df, batch_id) runs one
    micro-batch through screen→commit→maintain; `table` is the
    transactional corpus TxnTable (created empty if absent).

    Posting increments are partitioned by ``s_bucket``
    (pmod(hash(s), N_SHINGLE_BUCKETS)) so the screen's corpus reads
    prune to the batch's shingle buckets.  Pass ``sizes_dir`` to
    also maintain the per-doc shingle-count store — with it, NO stage
    of the screen reads the full posting store (the sizes fallback is
    the one remaining full pass otherwise).

    ``run_id`` scopes batch ids to one checkpoint lifetime: micro-batch
    ids restart at 0 whenever a stream gets a fresh checkpoint dir, so
    without the scope a restarted stream's batches would compare ≤ the
    old run's last_txn mark and be skipped whole — silently discarding
    genuinely new documents — and their maintenance partitions would
    overwrite the old run's.  run_document_admission derives it from a
    marker persisted in the checkpoint dir; direct callers that manage
    their own batch-id monotonicity may leave it None."""
    from data_ingestion_challenge_spark.operators.dedup import (
        incremental_dedup_verdict,
    )
    from data_ingestion_challenge_spark.txn import TxnTable

    table = TxnTable(spark, table_path, key="doc_id",
                     n_buckets=n_buckets)
    if table.version() == 0:
        table = TxnTable.create(
            spark, table_path, spark.createDataFrame([], DOCS_SCHEMA),
            key="doc_id", n_buckets=n_buckets)

    app = _APP if run_id is None else f"{_APP}:{run_id}"

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        tag = str(batch_id) if run_id is None \
            else f"{run_id}-{batch_id}"
        if batch_id <= table.last_txn(app):
            return  # crash-replayed batch: already committed whole
        # The store's layout (bucketed with which modulus, or flat) is
        # read from its persisted meta, NOT the current constant — a
        # raised N_SHINGLE_BUCKETS or a legacy flat store must neither
        # mis-prune nor mix partition depths.
        mod = store_bucket_mod(postings_dir)
        batch = batch_df.localCheckpoint()
        survivors, handles = _dedup_within_batch(batch, n, tau)
        have_corpus = bool(_batch_tags(postings_dir))
        if have_corpus:
            # basePath surfaces the ingest_batch partition column;
            # excluding THIS batch's partition makes the screen
            # replay-safe — a crash between the posting write and the
            # txn commit must not let the batch's own postings
            # self-match its survivors on the rerun (they would all
            # flag as dups of themselves and be lost).
            # String-compare the partition value: run-scoped tags make
            # it a string column, bare ids an int one — cast covers
            # both.
            raw = (spark.read.option("basePath", postings_dir)
                   .parquet(postings_dir)
                   .where(col("ingest_batch").cast("string")
                          != F.lit(tag)))
            pruned = mod is not None and "s_bucket" in raw.columns
            corpus_posting = raw.select(
                "doc_id", "s",
                *(["s_bucket"] if pruned else []))
            # The sizes store is only SOUND if it covers every
            # posting increment: the size join is what ratifies a
            # candidate, so a corpus doc missing from it could never
            # be flagged as a dup target.  Coverage = every posting
            # batch tag has a sizes tag (a store enabled mid-life
            # fails this and falls back to the full aggregation
            # until compaction produces a covered store).
            sizes = None
            if (sizes_dir is not None
                    and _batch_tags(postings_dir) - {tag}
                    <= _batch_tags(sizes_dir)):
                sizes = (spark.read.option("basePath", sizes_dir)
                         .parquet(sizes_dir)
                         .where(col("ingest_batch").cast("string")
                                != F.lit(tag))
                         .select("doc_id", "n"))
            # Survivor postings = a filter of the already-cached
            # batch postings (survivors ⊆ exact) — no re-tokenize.
            sp = (handles[0]
                  .join(survivors.select("doc_id"), "doc_id",
                        "left_semi"))
            verdict = incremental_dedup_verdict(
                survivors, corpus_posting, n=n, tau=tau,
                sizes=sizes,
                prune_mod=mod if pruned else None,
                new_post=sp)
        else:  # empty corpus: everything is novel
            verdict = survivors.select(
                "doc_id", F.lit(False).alias("is_dup"),
                F.lit(None).cast("long").alias("dup_of"),
                F.lit(None).cast("double").alias("jaccard"))
        # The admission log covers EVERY arriving doc: batch-dropped
        # rows appear with dup_of NULL and kept=false (their witness
        # is in-batch), screened rows carry the corpus dup target.
        admitted = survivors.join(
            verdict.where(~col("is_dup")).select("doc_id"),
            "doc_id", "left_semi").localCheckpoint()
        log = (batch.select("doc_id").distinct()
               .join(verdict, "doc_id", "left")
               .withColumn("kept", F.coalesce(~col("is_dup"),
                                              F.lit(False)))
               .select("doc_id", "kept", "dup_of", "jaccard"))
        log.write.mode("overwrite").parquet(
            os.path.join(log_dir, f"ingest_batch={tag}"))
        # Postings BEFORE the txn commit: if we crash between the
        # two, the replay overwrites this same dir (no duplicate
        # rows) and then commits — never a committed doc without
        # postings, so no admitted dup can slip past a crash.
        # Admitted docs' postings are a filter of the already-built
        # batch postings — no recompute.  A batch with nothing to
        # admit (or only sub-n-gram docs) writes NO partition: a
        # partitionBy write of an empty frame leaves a file-less dir
        # that breaks schema inference for every later read.
        new_post = handles[0].join(admitted.select("doc_id"),
                                   "doc_id", "left_semi")
        if not new_post.isEmpty():
            writer = new_post
            if mod is not None:
                writer = (writer.withColumn(
                    "s_bucket", F.pmod(F.hash("s"), F.lit(mod)))
                    .write.mode("overwrite").partitionBy("s_bucket"))
            else:
                writer = writer.write.mode("overwrite")
            writer.parquet(os.path.join(postings_dir,
                                        f"ingest_batch={tag}"))
            if sizes_dir is not None:
                (new_post.groupBy("doc_id")
                 .agg(F.count("*").alias("n"))
                 .write.mode("overwrite")
                 .parquet(os.path.join(sizes_dir,
                                       f"ingest_batch={tag}")))
        table.merge_into(admitted,
                         _txn={"app": app, "batch_id": batch_id})
        # All derived frames are materialized (log/postings written,
        # admitted checkpointed, commit done): release the per-batch
        # posting caches — a long-running stream must not accumulate
        # one per micro-batch.
        for h in handles:
            h.unpersist()

    return admit, table


def run_document_admission(spark: SparkSession, watch_dir: str,
                           table_path: str, postings_dir: str,
                           log_dir: str, checkpoint: str,
                           n_buckets: int = 32, n: int = 3,
                           tau: float = 0.8,
                           sizes_dir: str | None = None):
    """Drain jsonl document drops from watch_dir through the admission
    sink (availableNow; re-call to pick up new drops).  Returns the
    corpus TxnTable.

    Batch ids are scoped to the checkpoint's lifetime via a marker
    persisted inside the checkpoint dir: a FRESH checkpoint (ids
    restart at 0) gets a fresh scope, so its batches are re-screened
    against the corpus instead of being skipped by the previous run's
    replay gate — previously-admitted docs simply re-reject as
    corpus dups; never-seen docs still admit."""
    import uuid

    os.makedirs(checkpoint, exist_ok=True)
    marker = os.path.join(checkpoint, "__admission_run_id")

    def _read_marker() -> str:
        try:
            with open(marker) as fh:
                return fh.read().strip()
        except FileNotFoundError:
            return ""

    run_id = _read_marker()
    if not run_id:
        # Atomic publish (tmp + replace): a crash during creation must
        # not leave an EMPTY marker — two checkpoints sharing the ''
        # scope would collide on batch ids, resurrecting exactly the
        # skipped-batch data loss the scope exists to prevent.
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(uuid.uuid4().hex[:12])
        os.replace(tmp, marker)
        run_id = _read_marker()

    admit, table = document_admission_sink(
        spark, table_path, postings_dir, log_dir,
        n_buckets=n_buckets, n=n, tau=tau, sizes_dir=sizes_dir,
        run_id=run_id)
    q = (spark.readStream.schema(DOCS_SCHEMA)
         .option("maxFilesPerTrigger", 16)
         .json(watch_dir)
         .writeStream.foreachBatch(admit)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return table
