"""Differential tests: native (C++) decode vs the Python decoder oracle.

The native decoder must emit byte-identical VCF rows (and suppress the same
candidates) across fuzzed probability vectors, alt-info shapes, and configs.
"""

import random

import numpy as np
import pytest

from clair3_tpu.decode import DecodeConfig, batch_decode
from clair3_tpu.native import decode_batch_native, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no native lib")

REF_SEQ = "G" * 16 + "A" + "G" * 16  # center base A

ALT_POOL = [
    "30-XC 14 RA 16 ",
    "20-",
    "1-RA 1 ",
    "25-IATT 5 DGG 4 XG 3 RA 13 ",
    "40-XT 2 XC 2 XG 2 RA 34 ",
    "15-IA" + "T" * 60 + " 3 RA 12 ",   # insertion longer than max_infer
    "33-D" + "G" * 55 + " 5 RA 28 ",
    "10-XA 10 ",                        # alt == would-be ref
    "28-IAT 6 IATG 6 RA 16 ",           # tied insertion counts
    "28-DT 5 DTG 5 DTGC 2 RA 16 ",      # tied deletion counts
    "12-IAC 4 DC 3 RA 5 ",              # both indel kinds present
    "50-XC 20 XT 11 RA 19 ",            # multi-allelic SNP evidence
    "9-XN 4 RA 5 ",                     # non-ACGT alt base
]

CONFIGS = [
    DecodeConfig(add_indel_length=True, pileup=False),
    DecodeConfig(add_indel_length=False, pileup=True),
    DecodeConfig(add_indel_length=True, pileup=False, gvcf=True,
                 show_ref_calls=True),
    DecodeConfig(add_indel_length=True, pileup=False, show_ref_calls=True,
                 quality_score_for_pass=15.0),
    DecodeConfig(add_indel_length=True, pileup=False, haploid_precise=True),
    DecodeConfig(add_indel_length=True, pileup=False, haploid_sensitive=True,
                 show_ref_calls=True),
    DecodeConfig(add_indel_length=True, pileup=False, enable_long_indel=True,
                 maximum_variant_length_that_need_infer=100_000),
    DecodeConfig(add_indel_length=True, pileup=False, keep_iupac_bases=True,
                 show_ref_calls=True),
]


def _fuzz_probs(rng, add_indel_length, alpha):
    v = rng.dirichlet(np.full(21, alpha)).tolist()
    v += rng.dirichlet(np.full(3, alpha)).tolist()
    if add_indel_length:
        v += rng.dirichlet(np.full(33, alpha)).tolist()
        v += rng.dirichlet(np.full(33, alpha)).tolist()
    return v


@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
def test_native_decode_matches_python_fuzz(cfg_idx):
    cfg = CONFIGS[cfg_idx]
    rng = np.random.default_rng(100 + cfg_idx)
    pyr = random.Random(100 + cfg_idx)
    pos_infos, alt_infos, probs = [], [], []
    for i in range(600):
        pos_infos.append(f"chr1:{1000 + i}:{REF_SEQ}")
        alt_infos.append(pyr.choice(ALT_POOL))
        # alternate diffuse and near-one-hot vectors so every outcome family
        # and the fallback loop are exercised
        alpha = (1.0, 0.05, 0.2)[i % 3]
        probs.append(_fuzz_probs(rng, cfg.add_indel_length, alpha))
    probs = np.asarray(probs, np.float64)

    expected = batch_decode(pos_infos, alt_infos, probs, cfg)
    got = decode_batch_native(pos_infos, alt_infos, probs, cfg)
    assert got == expected


def test_native_decode_targeted_onehot():
    """Every (gt21, zygosity) one-hot with assorted lengths decodes
    identically to Python."""
    cfg = DecodeConfig(add_indel_length=True, pileup=False,
                       show_ref_calls=True, gvcf=True)
    pos_infos, alt_infos, probs = [], [], []
    pyr = random.Random(7)
    i = 0
    for gt21 in range(21):
        for zyg in range(3):
            for len1, len2 in ((0, 0), (1, 1), (-2, -2), (-1, 2), (3, 5),
                               (16, 16), (-16, -16)):
                v = np.full(90, 1e-4)
                v[gt21] = 0.9
                v[21 + zyg] = 0.9
                v[24 + len1 + 16] = 0.9
                v[57 + len2 + 16] = 0.9
                v[:21] /= v[:21].sum()
                v[21:24] /= v[21:24].sum()
                v[24:57] /= v[24:57].sum()
                v[57:90] /= v[57:90].sum()
                probs.append(v)
                pos_infos.append(f"chr1:{2000 + i}:{REF_SEQ}")
                alt_infos.append(pyr.choice(ALT_POOL))
                i += 1
    probs = np.asarray(probs)
    expected = batch_decode(pos_infos, alt_infos, probs, cfg)
    got = decode_batch_native(pos_infos, alt_infos, probs, cfg)
    assert got == expected


def test_native_decode_single_base_refseq_and_odd_chrom():
    """pos_info with a 1-base reference sequence (head/tail mode) and a
    chromosome name containing ':' must parse identically."""
    cfg = DecodeConfig(add_indel_length=False, pileup=True, show_ref_calls=True)
    rng = np.random.default_rng(5)
    pos_infos, alt_infos, probs = [], [], []
    for i in range(200):
        ctg = "HLA-A*01:01" if i % 2 else "chr1"
        ref = "A" if i % 3 else REF_SEQ
        pos_infos.append(f"{ctg}:{500 + i}:{ref}")
        alt_infos.append(ALT_POOL[i % len(ALT_POOL)])
        probs.append(_fuzz_probs(rng, False, 0.3))
    probs = np.asarray(probs)
    expected = batch_decode(pos_infos, alt_infos, probs, cfg)
    got = decode_batch_native(pos_infos, alt_infos, probs, cfg)
    assert got == expected


def test_native_decode_iupac_center():
    """IUPAC center bases route through IUPAC_TO_ACGT / convert_iupac_to_n
    the same way."""
    cfg = DecodeConfig(add_indel_length=True, pileup=False, show_ref_calls=True)
    rng = np.random.default_rng(9)
    pos_infos, alt_infos, probs = [], [], []
    for i, center in enumerate("RYSWKMBDHVNU" * 10):
        ref = "G" * 16 + center + "G" * 16
        pos_infos.append(f"chr2:{700 + i}:{ref}")
        alt_infos.append(ALT_POOL[i % len(ALT_POOL)])
        probs.append(_fuzz_probs(rng, True, 0.15))
    probs = np.asarray(probs)
    expected = batch_decode(pos_infos, alt_infos, probs, cfg)
    got = decode_batch_native(pos_infos, alt_infos, probs, cfg)
    assert got == expected
