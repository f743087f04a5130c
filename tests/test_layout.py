"""Z-order layout tests: Morton key bit-exactness vs a pure-Python
oracle, high-bit masking, and the property the layout exists for —
parquet footer min/max stats over a zorder_write prune files on EITHER
dimension's predicate, which a single-key linear sort cannot do for the
secondary dimension."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from mpds_spark.sources.layout import zorder_key, zorder_write


def py_morton(x: int, y: int, bits: int) -> int:
    acc = 0
    for i in range(bits):
        acc |= ((x >> i) & 1) << (2 * i)
        acc |= ((y >> i) & 1) << (2 * i + 1)
    return acc


@pytest.mark.parametrize("bits", [1, 4, 8, 16, 31])
def test_zorder_key_matches_python(spark, bits):
    rng = np.random.default_rng(5 + bits)
    n = 200
    xs = rng.integers(0, 2**bits, size=n, dtype=np.int64)
    ys = rng.integers(0, 2**bits, size=n, dtype=np.int64)
    sdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], ["x", "y"]
    )
    got = sdf.select(zorder_key("x", "y", bits=bits).alias("z")).collect()
    for row, a, b in zip(got, xs, ys):
        assert row["z"] == py_morton(int(a), int(b), bits)


def test_zorder_key_masks_high_bits(spark):
    # values >= 2^bits contribute only their low bits (documented mask)
    sdf = spark.createDataFrame([(256 + 3, 512 + 5)], ["x", "y"])
    got = sdf.select(zorder_key("x", "y", bits=8).alias("z")).first()["z"]
    assert got == py_morton(3, 5, 8)


def test_zorder_key_bits_validation(spark):
    with pytest.raises(ValueError):
        zorder_key("x", "y", bits=0)
    with pytest.raises(ValueError):
        zorder_key("x", "y", bits=32)


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """Footer min/max stats of a zorder_write must prune a point
    predicate on EITHER dimension to a strict subset of files, and the
    secondary dimension must prune strictly better than under a linear
    sort by the primary key (where every file spans ~the full y range)."""
    rng = np.random.default_rng(99)
    n, side = 4096, 64
    xs = rng.integers(0, side, size=n, dtype=np.int64)
    ys = rng.integers(0, side, size=n, dtype=np.int64)
    sdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], ["x", "y"]
    )

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(sdf, zpath, "x", "y", bits=6, n_files=16)
    (
        sdf.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def file_boxes(path):
        boxes = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name not in lo:
                        continue
                    st = col.statistics
                    lo[name] = (
                        st.min if lo[name] is None else min(lo[name], st.min)
                    )
                    hi[name] = (
                        st.max if hi[name] is None else max(hi[name], st.max)
                    )
            boxes.append((lo, hi))
        return boxes

    def hit_count(boxes, dim, point):
        return sum(1 for lo, hi in boxes if lo[dim] <= point <= hi[dim])

    zb, lb = file_boxes(zpath), file_boxes(lpath)
    assert len(zb) == 16

    # round-trip: no rows lost, payload intact
    assert spark.read.parquet(zpath).count() == n

    z_x = np.mean([hit_count(zb, "x", p) for p in (5, 22, 47, 60)])
    z_y = np.mean([hit_count(zb, "y", p) for p in (5, 22, 47, 60)])
    l_y = np.mean([hit_count(lb, "y", p) for p in (5, 22, 47, 60)])

    # either predicate prunes under z-order…
    assert z_x < len(zb)
    assert z_y < len(zb)
    # …while the linear layout cannot prune the secondary dim at all
    # (every file spans essentially the whole y range) and z-order must
    # beat it by a real margin
    assert l_y >= 0.9 * len(lb)
    assert z_y <= 0.75 * l_y
