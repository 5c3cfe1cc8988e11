"""IcebergStageCheckpoint protocol logic, exercised against an
in-memory fake catalog (no Iceberg jar ships in this container — the
fake implements exactly the DataFrame/SQL surface run_stage touches, so
the idempotency-by-overwritePartitions contract is testable)."""

from deepseek_ocr_omnidocbench_spark.sources.iceberg import IcebergStageCheckpoint


class FakeWriter:
    def __init__(self, cat, table, rows):
        self.cat, self.table, self.rows = cat, table, rows

    def partitionedBy(self, col):
        return self

    def create(self):
        assert self.table not in self.cat.tables, "create on existing table"
        self.cat.tables[self.table] = list(self.rows)

    def append(self):
        self.cat.tables.setdefault(self.table, []).extend(self.rows)

    def overwritePartitions(self):
        assert self.table in self.cat.tables, "overwrite on missing table"
        buckets = {r["_bucket"] for r in self.rows}
        kept = [r for r in self.cat.tables[self.table]
                if r["_bucket"] not in buckets]
        self.cat.tables[self.table] = kept + list(self.rows)


class FakeDF:
    """Rows are dicts; implements the exact chain run_stage uses."""

    def __init__(self, cat, rows):
        self.cat, self.rows = cat, rows

    def withColumn(self, name, value):
        lit = getattr(value, "_lit", value)
        return FakeDF(self.cat, [{**r, name: lit} for r in self.rows])

    def where(self, cond):  # cond is a _BucketEq from the fake functions
        return FakeDF(self.cat, [r for r in self.rows
                                 if r.get("_bucket") == cond.value])

    def drop(self, col):
        return FakeDF(self.cat, [{k: v for k, v in r.items() if k != col}
                                 for r in self.rows])

    def count(self):
        return len(self.rows)

    def writeTo(self, table):
        return FakeWriter(self.cat, table, self.rows)


class FakeSpark:
    def __init__(self, cat):
        self.cat = cat

    def sql(self, q):
        if q.startswith("CREATE TABLE IF NOT EXISTS"):
            name = q.split()[5].split("(")[0]
            self.cat.tables.setdefault(name, [])
            return FakeRows([])
        if q.startswith("SELECT DISTINCT partition_id"):
            table = q.split("FROM ")[1].split()[0]
            stage = q.split("stage = '")[1].split("'")[0]
            rows = [r for r in self.cat.tables.get(table, [])
                    if r["stage"] == stage]
            return FakeRows([{"partition_id": r["partition_id"]} for r in rows])
        if q.startswith("SHOW TABLES IN"):
            ns = q.split()[-1]
            names = [t.split(".", 1)[1] for t in self.cat.tables
                     if t.startswith(ns + ".")]
            return FakeRows([{"tableName": n} for n in names])
        raise AssertionError("unexpected sql: " + q)

    def table(self, name):
        return FakeDF(self.cat, self.cat.tables.get(name, []))

    def createDataFrame(self, data, schema):
        fields = [f.strip().split()[0] for f in schema.split(",")]
        return FakeDF(self.cat, [dict(zip(fields, row)) for row in data])


class FakeRows(list):
    def collect(self):
        return self


class Catalog:
    def __init__(self):
        self.tables = {}


class _BucketEq:
    def __init__(self, value):
        self.value = value


def _fake_env(monkeypatch, n_buckets=4):
    """Wire the fakes through the module's F.* uses."""
    import deepseek_ocr_omnidocbench_spark.sources.iceberg as ice

    monkeypatch.setattr(ice, "iceberg_available", lambda s: True)

    class _Col:
        def __init__(self, name):
            self.name = name

        def __eq__(self, other):
            return _BucketEq(other)

        def cast(self, t):
            return self

    class _Lit:
        def __init__(self, v):
            self._lit = v

    class FakeF:
        @staticmethod
        def col(name):
            return _Col(name)

        @staticmethod
        def lit(v):
            return _Lit(v)

        @staticmethod
        def pmod(a, b):
            return _Col("_pmod")

        @staticmethod
        def xxhash64(c):
            return _Col("_hash")

        @staticmethod
        def current_timestamp():
            return _Lit("ts")

    monkeypatch.setattr(ice, "F", FakeF)
    cat = Catalog()
    ckpt = IcebergStageCheckpoint(FakeSpark(cat), "glue", n_buckets=n_buckets)
    return ice, cat, ckpt


def _input_df(cat, n_buckets=4, rows_per_bucket=3):
    rows = [{"url": "u%d-%d" % (b, i), "_bucket": b}
            for b in range(n_buckets) for i in range(rows_per_bucket)]
    return FakeDF(cat, rows)


def test_run_stage_commits_all_buckets(monkeypatch):
    ice, cat, ckpt = _fake_env(monkeypatch)
    monkeypatch.setattr(ckpt, "bucket_of", lambda df: df)
    out = ckpt.run_stage("extract", _input_df(cat), lambda df: df)
    assert len(cat.tables["glue.extract"]) == 12
    lineage = cat.tables["glue.lineage"]
    assert sorted(r["partition_id"] for r in lineage) == [0, 1, 2, 3]
    assert all(r["doc_count"] == 3 for r in lineage)
    assert out.count() == 12


def test_replayed_bucket_does_not_duplicate(monkeypatch):
    """Crash between data commit and lineage append: the bucket's data
    is in the table but not in lineage.  A restart must replace that
    bucket's partition, not append a second copy."""
    ice, cat, ckpt = _fake_env(monkeypatch)
    monkeypatch.setattr(ckpt, "bucket_of", lambda df: df)
    inp = _input_df(cat)
    # simulate the torn state: bucket 0's data committed, no lineage row
    cat.tables["glue.extract"] = [
        {"url": "u0-%d" % i, "_bucket": 0} for i in range(3)]
    ckpt.run_stage("extract", inp, lambda df: df)
    assert len(cat.tables["glue.extract"]) == 12  # not 15
    assert sorted(r["partition_id"] for r in cat.tables["glue.lineage"]) \
        == [0, 1, 2, 3]


def test_committed_buckets_are_skipped(monkeypatch):
    ice, cat, ckpt = _fake_env(monkeypatch)
    monkeypatch.setattr(ckpt, "bucket_of", lambda df: df)
    inp = _input_df(cat)
    ckpt.run_stage("extract", inp, lambda df: df)
    runs = []
    ckpt.run_stage("extract", inp,
                   lambda df: (runs.append(1), df)[1])
    assert runs == []  # everything already committed -> no transform ran


def test_retried_bucket_creates_missing_table(monkeypatch):
    """Lineage says buckets 0-2 done but the stage table was dropped:
    the first retried bucket (b=3) must create the table, not append to
    a nonexistent one."""
    ice, cat, ckpt = _fake_env(monkeypatch)
    monkeypatch.setattr(ckpt, "bucket_of", lambda df: df)
    inp = _input_df(cat)
    ckpt.run_stage("extract", inp, lambda df: df)
    del cat.tables["glue.extract"]
    # drop lineage for bucket 3 only -> restart retries just bucket 3
    cat.tables["glue.lineage"] = [
        r for r in cat.tables["glue.lineage"] if r["partition_id"] != 3]
    ckpt.run_stage("extract", inp, lambda df: df)
    assert {r["_bucket"] for r in cat.tables["glue.extract"]} == {3}
