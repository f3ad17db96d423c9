import os

import numpy as np
import pytest

from clair3_tpu.io.bai import BaiIndex, write_bai
from clair3_tpu.io.bam import BamReader, read_bam_header
from clair3_tpu.testing import SimVariant, random_reference, write_test_case


@pytest.fixture(scope="module")
def indexed_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("bai")
    ref = random_reference(200_000, seed=101)
    variants = [SimVariant(p, ref[p], "A" if ref[p] != "A" else "C", (0, 1))
                for p in range(5_000, 195_000, 10_000)]
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=200_000, variants=variants, coverage=8,
        read_length=2000, seed=101)
    return {"bam": bam, "fasta": fasta, "ref": ref}


def test_write_bam_creates_bai(indexed_case):
    assert os.path.exists(indexed_case["bam"] + ".bai")


def test_read_bam_header_streams(indexed_case):
    text, refs, lens = read_bam_header(indexed_case["bam"])
    assert refs == ["chr1"]
    assert lens == [200_000]
    assert "@SQ" in text


def test_bai_query_windows(indexed_case):
    idx = BaiIndex(indexed_case["bam"] + ".bai")
    w1 = idx.query_voff_range(0, 0, 5_000)
    w2 = idx.query_voff_range(0, 190_000, 200_000)
    assert w1 is not None and w2 is not None
    # late regions start at later file offsets
    assert (w2[0] >> 16) > (w1[0] >> 16)
    assert idx.query_voff_range(5, 0, 100) is None  # absent tid


def test_indexed_fetch_matches_full_scan(indexed_case):
    bam_path = indexed_case["bam"]
    regions = [(0, 3000), (97_000, 103_000), (150_000, 151_000), (199_000, 200_000)]
    rd_idx = BamReader(bam_path)
    assert rd_idx._bai is not None
    for start, end in regions:
        got = [(r.qname, r.pos) for r in rd_idx.fetch("chr1", start, end)]
        rd_full = BamReader(bam_path)
        rd_full._bai = None  # force full scan
        expected = [(r.qname, r.pos) for r in rd_full.fetch("chr1", start, end)]
        assert got == expected, (start, end)
        assert len(got) > 0


def test_indexed_fetch_decompresses_subrange(indexed_case):
    """Indexed fetch must not materialize the full file."""
    rd = BamReader(indexed_case["bam"])
    list(rd.fetch("chr1", 100_000, 101_000))
    assert rd._data is None  # full decompress never happened


def test_fetch_without_bai_still_works(indexed_case, tmp_path):
    import shutil

    bam2 = str(tmp_path / "noindex.bam")
    shutil.copy(indexed_case["bam"], bam2)
    rd = BamReader(bam2)
    assert rd._bai is None
    got = list(rd.fetch("chr1", 97_000, 103_000))
    assert len(got) > 0
