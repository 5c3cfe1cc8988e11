"""Structured Streaming ingest: incremental extraction + streaming dedup."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.sources.pages import (
    PAGES_ARROW_SCHEMA,
    generate_pages,
)
from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
    stream_dedup,
    stream_extract,
)


def write_drop(rows, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_ARROW_SCHEMA), path)


@pytest.fixture()
def drops(tmp_path):
    rows = [r for r in generate_pages(60, seed=9)]
    # two crawl drops arriving as separate files
    write_drop(rows[:30], str(tmp_path / "in" / "drop-000.parquet"))
    write_drop(rows[30:], str(tmp_path / "in" / "drop-001.parquet"))
    return tmp_path, rows


def test_stream_extract_processes_all_drops(spark, drops):
    tmp_path, rows = drops
    q = stream_extract(spark, str(tmp_path / "in"), str(tmp_path / "out"),
                       str(tmp_path / "ck"))
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "out"))
    non_empty = [r for r in rows if r["category"] != "empty"]
    assert out.count() >= len(non_empty) - 5
    # byte identity holds through the streaming path for every category
    src = spark.createDataFrame(
        pa.Table.from_pylist(rows, schema=PAGES_ARROW_SCHEMA).to_pandas())
    joined = out.join(src.select("url", "text", "category"), "url")
    bad = joined.where(F.col("markdown") != F.col("text")).count()
    assert bad == 0
    # micro-batches recorded
    assert out.select("batch_id").distinct().count() >= 1


def test_stream_extract_is_incremental(spark, drops):
    """Restarting the query with the same checkpoint reprocesses nothing."""
    tmp_path, rows = drops
    q = stream_extract(spark, str(tmp_path / "in"), str(tmp_path / "out"),
                       str(tmp_path / "ck"))
    q.awaitTermination(180)
    n1 = spark.read.parquet(str(tmp_path / "out")).count()
    q2 = stream_extract(spark, str(tmp_path / "in"), str(tmp_path / "out"),
                        str(tmp_path / "ck"))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == n1


def test_stream_extract_batch_replay_is_idempotent(spark, drops):
    """foreachBatch replays a micro-batch when offsets weren't committed;
    the dynamic-partition-overwrite sink must absorb the replay without
    duplicating rows (exactly-once claim)."""
    from deepseek_ocr_omnidocbench_spark.plans.extract_pipeline import (
        run_pipeline_inline,
    )

    tmp_path, rows = drops
    q = stream_extract(spark, str(tmp_path / "in"), str(tmp_path / "out"),
                       str(tmp_path / "ck"))
    q.awaitTermination(180)
    out_path = str(tmp_path / "out")
    n1 = spark.read.parquet(out_path).count()
    # simulate a replay of batch 0 (both drops fit one trigger): re-run
    # the per-batch write by hand with the same input
    batch_df = spark.read.parquet(str(tmp_path / "in"))
    docs = run_pipeline_inline(batch_df, salt_buckets=0)
    (docs.withColumn("batch_id", F.lit(0))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(out_path))
    assert spark.read.parquet(out_path).count() == n1


def test_stream_dedup_drops_duplicate_content(spark, tmp_path):
    rows = generate_pages(20, seed=3)
    write_drop(rows, str(tmp_path / "in" / "a.parquet"))
    write_drop(  # same content, different urls -> all dups by hash
        [{**r, "url": r["url"] + "?repost"} for r in rows],
        str(tmp_path / "in" / "b.parquet"))
    q = stream_dedup(spark, str(tmp_path / "in"), str(tmp_path / "out"),
                     str(tmp_path / "ck"))
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == len(rows)
    assert out.select("content_hash").distinct().count() == len(rows)


def test_stream_crawl_rates_windows(spark, drops):
    """Watermarked windowed aggregation: every page lands in exactly one
    event-time window; totals reconcile with the input."""
    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_crawl_rates,
    )

    import datetime as dt

    tmp_path, rows = drops
    # append mode only emits a window once the watermark passes it, so
    # feed a late sentinel page (one file per trigger) that advances the
    # event clock beyond every real window
    sentinel = {**rows[0], "url": "https://sentinel.example/x",
                "warc_ts": max(r["warc_ts"] for r in rows)
                + dt.timedelta(hours=1)}
    write_drop([sentinel], str(tmp_path / "in" / "drop-zzz.parquet"))
    q = stream_crawl_rates(spark, str(tmp_path / "in"), str(tmp_path / "rates"),
                           str(tmp_path / "rck"), window="1 minute",
                           max_files_per_trigger=1)
    q.awaitTermination(240)
    out = spark.read.parquet(str(tmp_path / "rates"))
    got = out.agg(F.sum("n_pages"), F.sum("total_bytes")).collect()[0]
    # the sentinel's own window stays pending (nothing later advances
    # the watermark past it), so the emitted totals equal the real rows
    want_bytes = sum(len(r["html"]) for r in rows)
    assert got[0] == len(rows)
    assert got[1] == want_bytes
    # windows are exactly one minute and non-overlapping
    spans = [(r["window_start"], r["window_end"]) for r in out.collect()]
    assert all((e - s).total_seconds() == 60 for s, e in spans)
    assert len(set(spans)) == len(spans)


def test_stream_domain_counters_stateful(spark, drops):
    """applyInPandasWithState: counters accumulate ACROSS micro-batches
    (state survives the batch boundary), and the final snapshot
    reconciles with the input."""
    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_domain_counters,
    )

    tmp_path, rows = drops
    q = stream_domain_counters(
        spark, str(tmp_path / "in"), str(tmp_path / "cnt"),
        str(tmp_path / "cck"))
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "cnt"))
    # keep the LAST emitted snapshot per domain (update mode re-emits)
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(F.desc("batch_id"),
                                             F.desc("total_pages"))
    last = out.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    got = {r["domain"]: r["total_pages"] for r in last.collect()}
    assert got.get("example.org") == len(rows)
    assert all(r["batches"] >= 1 for r in last.collect())


def test_stream_curate_gates_and_ledger(spark, drops):
    from datetime import datetime

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_curate,
    )

    tmp_path, rows = drops
    # the synthetic generator emits stopword-free word soup (correctly
    # gated out as non-English); add a drop of real-English articles so
    # the keep path is exercised too
    para = ("The river was quiet in the morning and the light fell on "
            "the water as the boats moved slowly past the old houses "
            "of the town, and everyone who walked along the bank could "
            "see that it was going to be a clear day. ")
    english = [{
        "url": f"https://en.example/a{i}", "warc_ts": datetime(2024, 1, 1),
        "html": (f"<html><body><article><h1>Morning {i}</h1>"
                 f"<p>{para}</p><p>{para}</p></article></body></html>"
                 ).encode(),
        "text": "", "lang": "en", "category": "article"}
        for i in range(5)]
    write_drop(english, str(tmp_path / "in" / "drop-002.parquet"))
    q = stream_curate(spark, str(tmp_path / "in"), str(tmp_path / "cur"),
                      str(tmp_path / "cur_ck"))
    q.awaitTermination(180)
    kept = spark.read.parquet(str(tmp_path / "cur" / "kept"))
    drops_df = spark.read.parquet(str(tmp_path / "cur" / "drops"))
    n_kept = kept.count()
    n_dropped = int(drops_df.agg(F.sum("n_dropped")).collect()[0][0] or 0)
    assert n_kept > 0 and n_dropped > 0
    # every drop reason names at least one gate
    reasons = {r["reasons"] for r in drops_df.select("reasons").collect()}
    assert all(r for r in reasons)
    gates = {"gopher", "spam", "runaway", "lang"}
    assert all(set(r.split(",")) <= gates for r in reasons)
    # kept docs re-pass the gates when re-evaluated in batch
    from deepseek_ocr_omnidocbench_spark.operators.curation import (
        curation_pipeline,
    )
    re = curation_pipeline(kept.withColumnRenamed("markdown", "text"))
    assert re.where(F.col("keep") == 0).count() == 0


def test_stream_near_dedup_across_batches(spark, tmp_path):
    from datetime import datetime

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_near_dedup,
    )

    body_a = ("the quick brown fox jumps over the lazy dog near the old "
              "river bank every single morning without fail ") * 3
    body_b = ("sailors crossed the wide cold ocean while bright stars "
              "turned slowly above the silent waves at night ") * 3

    def page(url, text):
        return {"url": url, "warc_ts": datetime(2024, 1, 1),
                "html": b"<html></html>", "text": text,
                "lang": "en", "category": "article"}

    # drop 0: A twice (within-batch dup) + B once
    write_drop([page("https://x/1", body_a), page("https://x/2", body_a),
                page("https://x/3", body_b)],
               str(tmp_path / "in" / "d0.parquet"))
    # drop 1: A again (cross-batch dup) + a new doc
    body_c = ("green valleys held small farms where quiet people grew "
              "tall corn and traded wool at the spring market fair ") * 3
    write_drop([page("https://x/4", body_a), page("https://x/5", body_c)],
               str(tmp_path / "in" / "d1.parquet"))

    q = stream_near_dedup(spark, str(tmp_path / "in"),
                          str(tmp_path / "nd"), str(tmp_path / "nd_ck"),
                          max_files_per_trigger=1)  # force 2 micro-batches
    q.awaitTermination(240)
    kept = spark.read.parquet(str(tmp_path / "nd" / "kept"))
    urls = {r["url"] for r in kept.select("url").collect()}
    # within-batch: one of x/1|x/2 survives; cross-batch: x/4 dropped
    assert len(urls & {"https://x/1", "https://x/2"}) == 1
    assert "https://x/4" not in urls
    assert "https://x/3" in urls
    assert "https://x/5" in urls  # distinct batch-1 doc survives
    # the signature store accumulated rows for the kept docs only
    store = spark.read.parquet(str(tmp_path / "nd" / "sig_store"))
    assert store.select("doc_id").distinct().count() == kept.count()
    # genuinely two micro-batches: the cross-batch path ran
    assert kept.select("batch_id").distinct().count() == 2


def test_stream_near_dedup_restart_is_idempotent(spark, tmp_path):
    from datetime import datetime

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_near_dedup,
    )

    text = ("calm winds moved across the high plain where herders kept "
            "their flocks beside slow clear streams all summer long ") * 3
    write_drop([{"url": "https://r/1", "warc_ts": datetime(2024, 1, 1),
                 "html": b"x", "text": text, "lang": "en",
                 "category": "article"}],
               str(tmp_path / "in" / "d0.parquet"))
    args = (spark, str(tmp_path / "in"), str(tmp_path / "nd"),
            str(tmp_path / "nd_ck"))
    stream_near_dedup(*args).awaitTermination(180)
    first = spark.read.parquet(str(tmp_path / "nd" / "kept")).count()
    # restart with the same checkpoint: nothing new -> no re-processing,
    # and the sink row count is unchanged (no duplicate appends)
    stream_near_dedup(*args).awaitTermination(120)
    again = spark.read.parquet(str(tmp_path / "nd" / "kept")).count()
    assert first == again == 1


def test_stream_curate_replayed_batch_is_idempotent(spark, drops):
    """Exactly-once contract: delete the last offset COMMIT so the
    restarted stream re-executes that micro-batch (the crash-between-
    write-and-commit window); batch_id dynamic partition overwrite must
    leave kept/drop counts unchanged instead of appending duplicates."""
    import os
    from datetime import datetime

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_curate,
    )

    tmp_path, rows = drops
    para = ("The river was quiet in the morning and the light fell on "
            "the water as the boats moved slowly past the old houses "
            "of the town, and everyone who walked along the bank could "
            "see that it was going to be a clear day. ")
    english = [{
        "url": f"https://en.example/r{i}", "warc_ts": datetime(2024, 1, 1),
        "html": (f"<html><body><article><h1>Replay {i}</h1>"
                 f"<p>{para}</p><p>{para}</p></article></body></html>"
                 ).encode(),
        "text": "", "lang": "en", "category": "article"}
        for i in range(5)]
    write_drop(english, str(tmp_path / "in" / "drop-replay.parquet"))
    q = stream_curate(spark, str(tmp_path / "in"), str(tmp_path / "rp"),
                      str(tmp_path / "rp_ck"))
    q.awaitTermination(180)
    q.stop()
    kept_dir = str(tmp_path / "rp" / "kept")
    drops_dir = str(tmp_path / "rp" / "drops")
    n_kept_1 = spark.read.parquet(kept_dir).count()
    n_drop_rows_1 = spark.read.parquet(drops_dir).count()
    assert n_kept_1 > 0 and n_drop_rows_1 > 0

    commits = sorted(os.listdir(str(tmp_path / "rp_ck" / "commits")))
    numeric = [c for c in commits if not c.startswith(".")]
    last = numeric[-1]
    os.remove(str(tmp_path / "rp_ck" / "commits" / last))
    # the local FS keeps a sidecar checksum; a stale one makes Hadoop's
    # ChecksumFileSystem reject the rewritten commit as concurrent use
    crc = str(tmp_path / "rp_ck" / "commits" / ("." + last + ".crc"))
    if os.path.exists(crc):
        os.remove(crc)

    q2 = stream_curate(spark, str(tmp_path / "in"), str(tmp_path / "rp"),
                       str(tmp_path / "rp_ck"))
    q2.awaitTermination(180)
    q2.stop()
    assert spark.read.parquet(kept_dir).count() == n_kept_1
    assert spark.read.parquet(drops_dir).count() == n_drop_rows_1


def test_stream_fetch_sessions(spark, tmp_path):
    """Native session_window: per-host gap sessions emitted once the
    watermark passes them; a later drop's far-future row advances the
    watermark and flushes the earlier sessions."""
    from datetime import datetime, timedelta

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_fetch_sessions,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def page(url, ts):
        return {"url": url, "warc_ts": ts, "html": b"<html>x</html>",
                "text": "", "lang": "en", "category": "article"}

    # host a: two fetches 5 min apart (one session), then one 30 min
    # later (second session); host b: single fetch
    drop0 = [page("https://a.example/1", t0),
             page("https://a.example/2", t0 + timedelta(minutes=5)),
             page("https://a.example/3", t0 + timedelta(minutes=35)),
             page("https://b.example/1", t0 + timedelta(minutes=1))]
    write_drop(drop0, str(tmp_path / "in" / "d0.parquet"))
    # watermark pusher: far-future fetch closes everything above
    write_drop([page("https://c.example/1", t0 + timedelta(hours=6))],
               str(tmp_path / "in" / "d1.parquet"))

    q = stream_fetch_sessions(spark, str(tmp_path / "in"),
                              str(tmp_path / "sess"),
                              str(tmp_path / "sess_ck"),
                              gap="10 minutes", watermark="30 minutes",
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    q.stop()
    rows = spark.read.parquet(str(tmp_path / "sess")).collect()
    got = {(r.host, r.session_start.minute): r for r in rows}
    a1 = got[("a.example", 0)]
    assert a1.n_fetches == 2
    assert (a1.session_end - a1.session_start).total_seconds() == 15 * 60
    a2 = got[("a.example", 35)]
    assert a2.n_fetches == 1
    b = got[("b.example", 1)]
    assert b.n_fetches == 1
    # c's own session is still pending (nothing advanced past it)
    assert all(r.host != "c.example" for r in rows)


def test_sig_store_compaction_bounds_history_reads(spark, tmp_path):
    """The store-rescan fix (VERDICT r4 #3): after compaction, the
    history a new micro-batch reads is ONE compacted generation plus
    only the batch partitions newer than it — input_files must contain
    no pre-generation batch partition, and pbucket pruning must shrink
    the compacted read to matching partition dirs."""
    from datetime import datetime

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        _sig_gen,
        sig_store_history,
        stream_near_dedup,
    )

    for b in range(5):
        # disjoint vocabularies per batch: these are NOT near-dups
        text = " ".join("tok%db%d" % (i, b) for i in range(40)) * 2
        write_drop([{"url": "https://c/%d" % b,
                     "warc_ts": datetime(2024, 1, 1), "html": b"x",
                     "text": text, "lang": "en", "category": "article"}],
                   str(tmp_path / "in" / ("d%d.parquet" % b)))
    out = str(tmp_path / "nd")
    q = stream_near_dedup(spark, str(tmp_path / "in"), out,
                          str(tmp_path / "nd_ck"),
                          max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(300)

    # 5 micro-batches, compact_every=2 -> generations 2 and 4; marker = 4
    assert _sig_gen(spark, out) == 4
    hist = sig_store_history(spark, out, batch_id=5)
    # input_file_name() reflects files ACTUALLY scanned after partition
    # pruning (inputFiles() lists the relation's files pre-pruning)
    files = [r[0] for r in hist.select(
        F.input_file_name().alias("f")).distinct().collect()]
    assert files
    for f in files:
        assert "sig_compacted/g=4" in f or "batch_id=4" in f, f
    # nothing read from the compacted-away per-batch partitions
    assert not any("batch_id=%d/" % b in f for b in range(4) for f in files)
    # history CONTENT is complete: every kept doc's signatures visible
    kept = spark.read.parquet(out + "/kept")
    store_all = spark.read.parquet(out + "/sig_store")
    assert hist.distinct().count() == \
        store_all.select("band", "bucket").distinct().count()

    # pbucket partition pruning on the compacted generation
    comp = spark.read.parquet(out + "/sig_compacted/g=4")
    some_p = int(comp.select("pbucket").first()[0])
    pruned = sig_store_history(spark, out, batch_id=5, pbuckets=[some_p])
    pfiles = [r[0] for r in pruned.select(
        F.input_file_name().alias("f")).distinct().collect()]
    for f in pfiles:
        assert ("pbucket=%d/" % some_p) in f, f

    # and the stream's own dedup behavior still holds: 5 distinct docs
    assert kept.count() == 5


def _write_imgs(specs, path):
    """specs: (media_id, width, height, pixel_fn(r, c))."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = {"media_id": [], "width": [], "height": [], "pixels": []}
    for mid, w, h, fn in specs:
        rows["media_id"].append(mid)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["pixels"].append([fn(i // w, i % w) for i in range(w * h)])
    t = pa.table({
        "media_id": pa.array(rows["media_id"], pa.string()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "pixels": pa.array(rows["pixels"], pa.list_(pa.int32())),
    })
    pq.write_table(t, path, row_group_size=50)


def test_stream_image_dedup_across_batches(spark, tmp_path):
    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_image_dedup,
    )

    def cellpat(base):
        # constant per 7x9 cell -> resolution-independent dHash
        return lambda w, h: (
            lambda r, c: (base * 37 + (r * 7 // h) * 13
                          + (c * 9 // w) * 29) % 256)

    a, b, c = cellpat(3), cellpat(11), cellpat(29)
    # batch 0: two copies of pattern A at different resolutions
    # (within-batch near-dup) + one B
    _write_imgs([("a1", 18, 14, a(18, 14)), ("a2", 36, 21, a(36, 21)),
                 ("b1", 18, 14, b(18, 14))],
                str(tmp_path / "in" / "d0.parquet"))
    # batch 1: A again (cross-batch dup) + new pattern C
    _write_imgs([("a3", 27, 14, a(27, 14)), ("c1", 18, 14, c(18, 14))],
                str(tmp_path / "in" / "d1.parquet"))

    q = stream_image_dedup(spark, str(tmp_path / "in"),
                           str(tmp_path / "out"), str(tmp_path / "ck"),
                           max_files_per_trigger=1)
    q.awaitTermination(240)
    kept = spark.read.parquet(str(tmp_path / "out" / "kept"))
    ids = {r["media_id"] for r in kept.select("media_id").collect()}
    assert len(ids & {"a1", "a2"}) == 1   # within-batch resolved
    assert "a3" not in ids                # cross-batch dropped
    assert {"b1", "c1"} <= ids            # distinct patterns survive
    assert kept.select("batch_id").distinct().count() == 2
    # store rows carry the full hash for the exact verify
    store = spark.read.parquet(str(tmp_path / "out" / "sig_store"))
    assert {"band", "bucket", "hash", "pbucket"} <= set(store.columns)
    assert store.select("media_id").distinct().count() == len(ids)


def test_stream_image_dedup_replayed_batch_is_idempotent(spark, tmp_path):
    """Delete the last offset COMMIT so the restarted stream re-executes
    the final micro-batch: batch_id dynamic partition overwrite must
    leave kept/store counts unchanged instead of appending duplicates,
    and the replayed batch must not drop itself against its own
    signatures (batch_id self-exclusion)."""
    import os

    from deepseek_ocr_omnidocbench_spark.streaming.ingest import (
        stream_image_dedup,
    )

    fn = lambda w, h: (lambda r, c: ((r * 7 // h) * 13    # noqa: E731
                                     + (c * 9 // w) * 29) % 256)
    _write_imgs([("p1", 18, 14, fn(18, 14))],
                str(tmp_path / "in" / "d0.parquet"))
    args = (spark, str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ck"))
    q = stream_image_dedup(*args)
    q.awaitTermination(180)
    q.stop()
    kept_dir = str(tmp_path / "out" / "kept")
    first = spark.read.parquet(kept_dir).count()
    # force a replay of the committed batch (drop the commit AND the
    # local-FS checksum sidecar, the ChecksumFileSystem trap)
    commits = os.path.join(str(tmp_path / "ck"), "commits")
    last = sorted(c for c in os.listdir(commits)
                  if not c.startswith("."))[-1]
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, "." + last + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = stream_image_dedup(*args)
    q2.awaitTermination(120)
    q2.stop()
    again = spark.read.parquet(kept_dir).count()
    assert first == again == 1
    store = spark.read.parquet(str(tmp_path / "out" / "sig_store"))
    # one surviving image x 4 bands, no duplicate appends
    assert store.count() == 4
