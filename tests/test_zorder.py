"""Z-order clustered writes (plans/zorder.py): multi-column footer
pruning, content preservation, key validation."""

import glob

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.plans.zorder import zorder_key, zorder_write


def _files_overlapping(dirpath, colname, lo, hi):
    """Files whose parquet footer [min, max] for ``colname`` overlaps
    [lo, hi] — what a stats-pruning reader would have to open."""
    import pyarrow.parquet as pq

    hit = 0
    files = sorted(glob.glob(f"{dirpath}/part-*.parquet"))
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                col = rg.column(i)
                if col.path_in_schema != colname:
                    continue
                st = col.statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, len(files)


def test_zorder_prunes_both_columns(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    zdir = str(tmp_path / "z")
    ldir = str(tmp_path / "lin")
    zorder_write(ev, zdir, ["user_id", "value"], n_files=16)
    # the linear strawman: perfectly clustered on user_id only
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(ldir)
    )

    los = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    u_lo, u_hi, v_lo, v_hi = los
    u_w = (u_hi - u_lo) / 16
    v_w = (v_hi - v_lo) / 16

    zu, zn = _files_overlapping(zdir, "user_id", u_lo + 5 * u_w, u_lo + 6 * u_w)
    zv, _ = _files_overlapping(zdir, "value", v_lo + 5 * v_w, v_lo + 6 * v_w)
    lu, ln = _files_overlapping(ldir, "user_id", u_lo + 5 * u_w, u_lo + 6 * u_w)
    lv, _ = _files_overlapping(ldir, "value", v_lo + 5 * v_w, v_lo + 6 * v_w)
    assert zn == 16 and ln == 16
    # linear: near-perfect on its sort column, useless on the other
    assert lu <= 3 and lv >= 12
    # z-order: BOTH columns prune (≈ sqrt(N) files for a 1/N slice)
    assert zu <= 8 and zv <= 8, (zu, zv)
    # and the combined read cost beats linear across the two predicates
    assert zu + zv < lu + lv, (zu, zv, lu, lv)

    # layout only — content is untouched
    z = spark.read.parquet(zdir)
    assert z.count() == ev.count()
    a = z.agg(F.sum("event_id"), F.sum(F.hash("user_id", "event_type"))).collect()
    b = ev.agg(F.sum("event_id"), F.sum(F.hash("user_id", "event_type"))).collect()
    assert a == b
    assert z.schema == ev.schema


def test_zorder_key_validation_and_nulls(spark, tmp_path):
    with pytest.raises(ValueError):
        zorder_key([F.lit(1)], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2)], bits=40)
    # NULLs and constant columns don't break the write
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, None), (4, 5.0)], "a long, b double"
    )
    out = str(tmp_path / "zn")
    zorder_write(df, out, ["a", "b"], n_files=2, bits=4)
    assert spark.read.parquet(out).count() == 4
