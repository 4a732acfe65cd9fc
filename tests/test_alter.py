"""Metadata-only ALTER TABLE (column mapping) on the Z-ordered layout.

Pins the Delta column-mapping semantics `alter_zordered` implements
(reference parity target: Delta Lake RENAME/DROP/ADD COLUMN under
column mapping mode=name — the reference repo itself has no ALTER, so
this is part of the beyond-reference lakehouse surface, SURVEY §2
pipeline/lakehouse):

- rename/drop/add are each ONE manifest commit, zero data movement;
- data files keep frozen physical names; every public read maps to
  logical names last, every public write maps from them first;
- ADD COLUMN defaults resolve per GENERATION (explicitly-written
  NULLs in post-add data stay NULL — never swallowed by a coalesce);
- time travel / restore / clone carry each snapshot's mapping;
- a full compaction MATERIALIZES the mapping and clears it;
- renames are invisible to diff/CDC (physical comparison space).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggregation_duckdb_spark.sources import layout as L


def _base(spark, n=600):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"),
        (F.col("id") * 2).alias("val"),
        F.concat(F.lit("doc"), F.col("id")).alias("txt"))


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark), p, "a", "b", bits=6, bucket_bits=3)
    return p


def test_rename_is_metadata_only_and_round_trips(spark, table):
    gens_before = L.read_manifest(spark, table)["gens"]
    L.alter_zordered(spark, table, renames={"val": "value"})
    m = L.read_manifest(spark, table)
    assert m["gens"] == gens_before          # no data moved
    out = L.read_zordered(spark, table)
    assert "value" in out.columns and "val" not in out.columns
    assert out.agg(F.sum("value")).collect()[0][0] == \
        sum(i * 2 for i in range(600))
    # rename back clears the mapping entry entirely
    L.alter_zordered(spark, table, renames={"value": "val"})
    assert "column_map" not in L.read_manifest(spark, table)
    assert "val" in L.read_zordered(spark, table).columns


def test_layout_dim_rename_keeps_box_pruning(spark, table):
    L.alter_zordered(spark, table, renames={"a": "alpha"})
    exp = sum(1 for i in range(600) if 0 <= i % 50 <= 10)
    assert L.read_zordered_box(spark, table, 0, 10, 0, 36).count() == exp
    nd = L.read_zordered_box_nd(spark, table, {"alpha": (0, 10)})
    assert "alpha" in nd.columns and nd.count() == exp
    # the spec itself stays keyed by the frozen physical name
    assert L.read_spec(spark, table).get("a_col") == "a"


def test_drop_add_and_generation_aware_defaults(spark, table):
    L.alter_zordered(spark, table, drops=["txt"],
                     adds={"lang": {"type": "string", "default": "en"}})
    out = L.read_zordered(spark, table)
    assert "txt" not in out.columns
    assert out.where(F.col("lang") == "en").count() == 600
    # post-add append writes real values INCLUDING explicit nulls
    app = spark.range(600, 610).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"), (F.col("id") * 2).alias("val"),
        F.when(F.col("id") % 2 == 0, F.lit("fr")).alias("lang"))
    L.append_zordered(app, table)
    out = L.read_zordered(spark, table)
    assert out.where(F.col("lang").isNull()).count() == 5
    assert out.where(F.col("lang") == "fr").count() == 5
    # ...and the distinction SURVIVES the fold into clustered storage
    L.compact_zordered(spark, table)
    out = L.read_zordered(spark, table)
    assert out.where(F.col("lang").isNull()).count() == 5
    assert out.where(F.col("lang") == "en").count() == 600


def test_writes_translate_logical_names_and_refuse_stale(spark, table):
    L.alter_zordered(spark, table, renames={"val": "value"})
    up = spark.createDataFrame(
        [(0, 0, 0, 999, "z")],
        "k long, a long, b long, value long, txt string")
    L.upsert_zordered(up, table, ["k"])
    assert L.read_zordered(spark, table).where(F.col("k") == 0) \
        .collect()[0]["value"] == 999
    L.merge_zordered(
        spark.createDataFrame([(0, 0, 0, 1, "z")],
                              "k long, a long, b long, value long, "
                              "txt string"),
        table, ["k"], when_matched_update={"value": "t.value + s.value"})
    assert L.read_zordered(spark, table).where(F.col("k") == 0) \
        .collect()[0]["value"] == 1000
    L.delete_zordered_keys(spark.createDataFrame([(5,)], "k long"),
                           table, ["k"])
    assert L.read_zordered(spark, table).where(F.col("k") == 5) \
        .count() == 0
    with pytest.raises(ValueError, match="val"):
        L.append_zordered(up.withColumnRenamed("value", "val"), table)
    with pytest.raises(ValueError, match="read_zordered_where"):
        L.read_zordered_where(spark, table, {"val": (0, 1)})


def test_time_travel_restore_and_clone_carry_mapping(spark, tmp_path):
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 100), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)
    L.alter_zordered(spark, p, renames={"val": "v2"})
    assert "val" in L.read_zordered(spark, p, version=1).columns
    assert "v2" in L.read_zordered(spark, p).columns
    c = str(tmp_path / "c")
    L.clone_zordered(spark, p, c)
    assert "v2" in L.read_zordered(spark, c).columns
    L.restore_zordered(spark, p, 1)
    assert "val" in L.read_zordered(spark, p).columns


def test_rename_is_invisible_to_diff(spark, tmp_path):
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 100), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)
    L.alter_zordered(spark, p, renames={"val": "v2"})
    d = L.diff_zordered(spark, p, v_from=1, v_to=2, key_cols=["k"])
    assert d.count() == 0                 # physical comparison space
    assert "v2" in d.columns              # schema maps to the NEW names


def test_full_compaction_materializes_the_mapping(spark, table):
    L.alter_zordered(spark, table, renames={"val": "value", "a": "alpha"},
                     drops=["txt"],
                     adds={"lang": {"type": "string", "default": "en"}})
    L.compact_zordered(spark, table, mode="full")
    m = L.read_manifest(spark, table)
    for k in ("column_map", "dropped_cols", "added_cols"):
        assert k not in m
    out = L.read_zordered(spark, table)
    assert {"value", "alpha", "lang"} <= set(out.columns)
    assert "txt" not in out.columns
    assert out.where(F.col("lang") == "en").count() == 600
    # the rewritten spec is keyed by the logical dim name now
    assert L.read_zordered_box_nd(spark, table,
                                  {"alpha": (0, 10)}).count() > 0


def test_bloom_lookup_through_a_rename(spark, table):
    L.alter_zordered(spark, table, renames={"val": "value"})
    L.build_bloom_index(spark, table, ["value"], m=4096, k=3)
    got = L.read_zordered_eq(spark, table, {"value": 84})
    assert {r["k"] for r in got.collect()} == {42}


def test_alter_validation_refusals(spark, table):
    with pytest.raises(ValueError, match="layout"):
        L.alter_zordered(spark, table, drops=["a"])
    with pytest.raises(ValueError, match="in use|carry"):
        L.alter_zordered(spark, table, adds={"txt": {"type": "string"}})
    with pytest.raises(ValueError, match="collides"):
        L.alter_zordered(spark, table, renames={"val": "b"})
    with pytest.raises(ValueError, match="no such column"):
        L.alter_zordered(spark, table, renames={"nope": "x"})
    L.alter_zordered(spark, table, drops=["txt"])
    with pytest.raises(ValueError, match="never reusable"):
        L.alter_zordered(spark, table, adds={"txt": {"type": "int"}})
    L.delete_zordered_keys(spark.createDataFrame([(1,)], "k long"),
                           table, ["k"])
    with pytest.raises(ValueError, match="tombstones"):
        L.alter_zordered(spark, table, drops=["k"])
    with pytest.raises(ValueError, match="CHECK"):
        p2 = str(table) + "_chk"
        L.write_zordered(_base(spark, 50), p2, "a", "b", bits=4,
                         bucket_bits=2, check="val >= 0")
        L.alter_zordered(spark, p2, drops=["val"])


def test_change_feed_skips_alter_and_maps_names(spark, tmp_path):
    from aggregation_duckdb_spark.streaming.change_feed import \
        _commit_changes
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 50), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)
    L.alter_zordered(spark, p, renames={"val": "value"})          # v2
    app = spark.range(50, 55).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"), (F.col("id") * 2).alias("value"),
        F.concat(F.lit("doc"), F.col("id")).alias("txt"))
    L.append_zordered(app, p)                                     # v3
    assert _commit_changes(spark, p, 2, ["k"]) is None            # alter
    ch = _commit_changes(spark, p, 3, ["k"])                      # append
    assert "value" in ch.columns and "val" not in ch.columns
    assert ch.count() == 5


def test_generated_columns(spark, tmp_path):
    """GENERATED columns (adds with "expr"): pre-add rows compute the
    expression at read time (written in logical names, stored over
    physical ones); a batch carrying the column is validated against
    it; rewrites materialize it — after which zone-map stats make it
    prunable; referenced columns cannot drop; bad expressions fail at
    ALTER time."""
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 300), p, "a", "b", bits=5,
                     bucket_bits=3)
    L.alter_zordered(spark, p, renames={"val": "amount"})
    with pytest.raises(ValueError, match="does not analyze"):
        L.alter_zordered(spark, p, adds={
            "bad": {"type": "long", "expr": "no_such_col + 1"}})
    L.alter_zordered(spark, p, adds={
        "dbl": {"type": "long", "expr": "amount * 2"}})

    out = L.read_zordered(spark, p)
    assert out.where(F.col("dbl") != F.col("amount") * 2).count() == 0
    assert out.count() == 300

    app = spark.range(300, 310).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"),
        (F.col("id") * 2).alias("amount"),
        F.lit("x").alias("txt"))
    L.append_zordered(app, p)                    # omitted: computed
    with pytest.raises(ValueError, match="generated column"):
        L.append_zordered(app.withColumn("dbl", F.lit(0)), p)
    L.append_zordered(
        app.withColumn("k", F.col("k") + 10)
           .withColumn("dbl", F.col("amount") * 2), p)  # exact: ok
    out = L.read_zordered(spark, p)
    assert out.count() == 320
    assert out.where(F.col("dbl") != F.col("amount") * 2).count() == 0

    # the fold MATERIALIZES the column: recorded per generation, and
    # its zone maps now prune non-layout range reads
    L.compact_zordered(spark, p)
    m = L.read_manifest(spark, p)
    gens_cols = set().union(*m["gen_columns"].values())
    assert "dbl" in gens_cols
    out = L.read_zordered(spark, p)      # re-read: old gens vacuumed
    w = L.read_zordered_where(spark, p, {"dbl": (0, 100)})
    assert w.count() == out.where(F.col("dbl").between(0, 100)).count()
    with pytest.raises(ValueError, match="references it"):
        L.alter_zordered(spark, p, drops=["amount"])


def test_reader_feature_protocol_gate(spark, tmp_path):
    """Protocol versioning (the Delta reader-features analogue): a
    snapshot whose semantics depend on the column mapping names the
    feature in the manifest; a reader that doesn't recognize a named
    feature FAILS loudly instead of silently misreading the table.
    Materializing / reverting the mapping clears the gate with it."""
    import json

    from aggregation_duckdb_spark import fsio

    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 50), p, "a", "b", bits=4,
                     bucket_bits=2)
    L.alter_zordered(spark, p, renames={"val": "value"},
                     adds={"dbl": {"type": "long",
                                   "expr": "value * 2"}})
    m = L.read_manifest(spark, p)
    assert m["reader_features"] == ["column_mapping",
                                    "generated_columns"]
    L.alter_zordered(spark, p, renames={"value": "val"},
                     drops=["dbl"])
    m = L.read_manifest(spark, p)
    assert m["reader_features"] == ["column_mapping"]  # drop list live
    L.compact_zordered(spark, p, mode="full")  # materializes
    assert "reader_features" not in L.read_manifest(spark, p)

    # a manifest demanding an UNKNOWN feature refuses to read
    v = L.table_version(spark, p)
    mdir = L._manifest_path(p)
    raw = json.loads(fsio.read_text(
        spark, fsio._join(mdir, f"v{v:08d}.json")))
    raw["reader_features"] = ["deletion_vectors_v9"]
    fsio.write_json_at(spark, mdir, raw, v + 1)
    L._MANIFEST_TEXT_CACHE.clear()
    with pytest.raises(ValueError, match="deletion_vectors_v9"):
        L.read_zordered(spark, p).count()


def test_alter_check_constraint(spark, tmp_path):
    """ALTER TABLE ADD/DROP CONSTRAINT: setting a CHECK validates the
    EXISTING visible rows first (a violating table changes nothing),
    then gates every later batch; expressions are written in logical
    names (stored physical — appends validate post-rename); dropping
    clears admission-time validation; a column the live check
    references still cannot drop."""
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 200), p, "a", "b", bits=5,
                     bucket_bits=3)
    L.alter_zordered(spark, p, renames={"val": "value"})
    # existing rows violate: refused, nothing changes
    with pytest.raises(ValueError, match="violated by"):
        L.alter_zordered(spark, p, set_check="value > 100")
    assert "check" not in L.read_spec(spark, p)
    # a satisfiable constraint lands (logical names in, physical out)
    L.alter_zordered(spark, p, set_check="value >= 0")
    assert L.read_spec(spark, p)["check"] == "val >= 0"
    bad = spark.createDataFrame([(9_000, 0, 0, -5, "x")],
                                "k long, a long, b long, value long, "
                                "txt string")
    with pytest.raises(ValueError, match="CHECK"):
        L.append_zordered(bad, p)
    L.append_zordered(bad.withColumn("value", F.lit(5)), p)
    # the checked column cannot drop while the constraint lives
    with pytest.raises(ValueError, match="CHECK"):
        L.alter_zordered(spark, p, drops=["value"])
    # DROP CONSTRAINT clears admission-time validation
    L.alter_zordered(spark, p, drop_check=True)
    assert "check" not in L.read_spec(spark, p)
    L.append_zordered(bad.withColumn("k", F.col("k") + 1), p)
    assert L.read_zordered(spark, p).count() == 202
    # history records the constraint commits
    ops = [(h["op"], h["op_metrics"]) for h in
           L.table_history(spark, p)]
    assert ("alter", {"columns_renamed": 0, "columns_dropped": 0,
                      "columns_added": 0, "check_set": 1}) in ops
    assert ("alter", {"columns_renamed": 0, "columns_dropped": 0,
                      "columns_added": 0, "check_dropped": 1}) in ops


def test_recluster_changes_layout_dimensions(spark, tmp_path):
    """recluster_zordered (the OPTIMIZE ZORDER BY / re-cluster verb):
    one call rewrites the table Morton-clustered on NEW dims as a
    forward commit — box reads bound the new dims, outstanding deltas
    and tombstones fold in, the CHECK constraint re-keys to logical
    names, and any column mapping materializes."""
    p = str(tmp_path / "t")
    L.write_zordered(_base(spark, 400), p, "a", "b", bits=6,
                     bucket_bits=3, check="val >= 0")
    L.alter_zordered(spark, p, renames={"val": "value"})
    L.append_zordered(
        _base(spark, 20).withColumnRenamed("val", "value")
        .withColumn("k", F.col("k") + 400), p)
    L.delete_zordered_keys(spark.createDataFrame([(0,)], "k long"),
                           p, ["k"])
    L.recluster_zordered(spark, p, cols=["k", "value"], bits=7,
                         bucket_bits=4)
    m = L.read_manifest(spark, p)
    assert [c for c, _, _ in L._spec_dims(m["spec"])] == ["k", "value"]
    assert m["spec"]["check"] == "value >= 0"    # re-keyed logical
    assert "column_map" not in m                 # materialized
    assert not m.get("deltas") and not m.get("tombstones")
    out = L.read_zordered(spark, p)
    assert out.count() == 419                    # 400 + 20 - 1 deleted
    box = L.read_zordered_box_nd(spark, p, {"k": (10, 20)})
    assert box.count() == 11
    # the new constraint still gates admissions
    with pytest.raises(ValueError, match="CHECK"):
        L.append_zordered(
            spark.createDataFrame([(9999, 0, 0, -1, "x")],
                                  "k long, a long, b long, value "
                                  "long, txt string"), p)


def test_timestamp_time_travel(spark, tmp_path):
    """Timestamp time travel (Delta's timestampAsOf): commit times
    are stamped INSIDE each manifest, version_at_timestamp binds a
    wall-clock instant to the newest snapshot at or before it, and a
    pinned read reproduces that state; instants before the table (or
    behind the retention horizon) raise instead of guessing."""
    import time

    p = str(tmp_path / "t")
    t_before = int(time.time() * 1000) - 1
    L.write_zordered(_base(spark, 100), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)               # v1
    time.sleep(1.1)
    t_mid = int(time.time() * 1000)
    time.sleep(1.1)
    L.delete_zordered_keys(
        spark.range(0, 50).select(F.col("id").alias("k")), p, ["k"])
    t_after = int(time.time() * 1000) + 1                       # v2

    assert L.version_at_timestamp(spark, p, t_mid) == 1
    assert L.version_at_timestamp(spark, p, t_after) == 2
    v = L.version_at_timestamp(spark, p, t_mid)
    assert L.read_zordered(spark, p, version=v).count() == 100
    assert L.read_zordered(spark, p).count() == 50
    with pytest.raises(ValueError, match="no retained snapshot"):
        L.version_at_timestamp(spark, p, t_before)
    hist = L.table_history(spark, p)
    assert all(h["committed_ms"] for h in hist)
    assert hist[0]["committed_ms"] >= hist[-1]["committed_ms"]


def test_mapped_full_compact_conflicts_with_concurrent_append(
        spark, table, monkeypatch):
    """A full compaction that MATERIALIZES a column mapping is a
    metadata change (Delta's metadata-conflict rule): a concurrent
    blind append's delta batch was written in the OLD physical names,
    and the fresh manifest clears the mapping — reading that batch
    untranslated afterwards would NULL-fill the renamed column. The
    rebase must CONFLICT, not merge-and-corrupt."""
    from aggregation_duckdb_spark import fsio

    L.alter_zordered(spark, table, renames={"val": "value"})
    app = spark.range(600, 605).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"), (F.col("id") * 2).alias("value"),
        F.concat(F.lit("doc"), F.col("id")).alias("txt"))

    real = fsio.write_json_at
    fired = {}

    def inject(spk, mdir, obj, version):
        if obj.get("op", "").startswith("compact") and "x" not in fired:
            fired["x"] = True
            L.append_zordered(app, table)  # lands mid-rebuild
        return real(spk, mdir, obj, version)

    monkeypatch.setattr(fsio, "write_json_at", inject)
    with pytest.raises(L.CommitConflict, match="column mapping"):
        L.compact_zordered(spark, table, mode="full")
    monkeypatch.undo()

    # nothing corrupted: the append landed, the mapping survived, and
    # a retry (no concurrent writer now) folds everything cleanly
    out = L.read_zordered(spark, table)
    assert out.count() == 605
    assert out.where(F.col("value").isNull()).count() == 0
    L.compact_zordered(spark, table, mode="full")
    m = L.read_manifest(spark, table)
    assert "column_map" not in m and m.get("deltas", []) == []
    out = L.read_zordered(spark, table)
    assert out.count() == 605
    assert out.where(F.col("value").isNull()).count() == 0


def test_expr_rewrite_skips_literals_derefs_and_functions():
    """Merge-clause / CHECK expression rewriting only touches genuine
    column-reference positions: string literals, struct-field derefs
    (s.val) and function-call names (val(...)) keep their spelling;
    backtick-quoted references still rewrite."""
    m = {"column_map": {"val": "value", "a": "alpha"}}
    f = lambda e: L._expr_physical(m, e)
    assert f("value + 1") == "val + 1"
    assert f("concat('value: ', cast(value as string))") \
        == "concat('value: ', cast(val as string))"
    assert f('"alpha value" = alpha') == '"alpha value" = a'
    # merge frame qualifiers t./s. are column refs and rewrite; any
    # other dotted prefix is a struct-field deref and does not
    assert f("t.value + s.value") == "t.val + s.val"
    assert f("other.value + value") == "other.value + val"
    assert f("value(alpha)") == "value(a)"
    assert f("`value` > 0") == "`val` > 0"
    assert f("'it''s value' || value") == "'it''s value' || val"
    # the qualifier only counts when it STARTS the reference: a path
    # segment named t/s deeper in a struct deref is a FIELD, and its
    # own fields must keep their spelling (x.s.value is field `value`
    # of field `s` of column `x`, not source-frame `value`)
    assert f("x.s.value + y.t.value") == "x.s.value + y.t.value"
    assert f("(s.value) = t.value") == "(s.val) = t.val"
    # inverse direction (CHECK materialization) honors the same rules
    assert L._expr_logical(m, "val > 0 AND 'val' <> txt") \
        == "value > 0 AND 'val' <> txt"


def test_recluster_conflicts_with_concurrent_append(spark, table,
                                                    monkeypatch):
    """recluster_zordered is a full-table rebuild, not a declared
    CREATE OR REPLACE: an append landing between its read and its
    commit must CONFLICT (replacing state wholesale would silently
    drop the append's delta batch — a lost update), and a retry with
    no competitor folds everything in."""
    from aggregation_duckdb_spark import fsio

    app = spark.range(600, 610).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"), (F.col("id") * 2).alias("val"),
        F.concat(F.lit("doc"), F.col("id")).alias("txt"))

    real = fsio.write_json_at
    fired = {}

    def inject(spk, mdir, obj, version):
        if obj.get("op") == "write" and "x" not in fired:
            fired["x"] = True
            L.append_zordered(app, table)  # lands mid-rebuild
        return real(spk, mdir, obj, version)

    monkeypatch.setattr(fsio, "write_json_at", inject)
    with pytest.raises(L.CommitConflict, match="mid-rebuild"):
        L.recluster_zordered(spark, table, cols=["val", "b"])
    monkeypatch.undo()

    assert L.read_zordered(spark, table).count() == 610  # append safe
    L.recluster_zordered(spark, table, cols=["val", "b"])
    out = L.read_zordered(spark, table)
    assert out.count() == 610
    assert L.read_manifest(spark, table).get("deltas", []) == []
