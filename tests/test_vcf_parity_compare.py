"""vcf_rows_numerically_equivalent — the bf16-TPU-vs-f32-CPU parity gate
used by the WGS soak's parity slice (scripts/wgs_scale_demo.py)."""

from clair3_tpu.testing import vcf_rows_numerically_equivalent

ROW = ("chr1\t5001\t.\tA\tG\t40.24\tPASS\tP\t"
       "GT:GQ:DP:AD:AF:PL\t1/1:40:30:0,30:1.0000:80,69,0")


def _mut(row, col, value):
    f = row.split("\t")
    f[col] = value
    return "\t".join(f)


def _mut_sample(row, key, value):
    f = row.split("\t")
    keys = f[8].split(":")
    vals = f[9].split(":")
    vals[keys.index(key)] = value
    f[9] = ":".join(vals)
    return "\t".join(f)


def test_identical_rows_pass():
    ok, stats = vcf_rows_numerically_equivalent([ROW], [ROW])
    assert ok and stats["max_dqual"] == 0.0


def test_qual_within_tolerance_passes_and_is_reported():
    ok, stats = vcf_rows_numerically_equivalent([ROW], [_mut(ROW, 5, "40.20")])
    assert ok
    assert abs(stats["max_dqual"] - 0.04) < 1e-9


def test_qual_beyond_tolerance_fails():
    ok, stats = vcf_rows_numerically_equivalent([ROW], [_mut(ROW, 5, "41.00")])
    assert not ok and "QUAL" in stats["violations"][0]


def test_gq_and_pl_one_unit_pass():
    b = _mut_sample(_mut_sample(ROW, "GQ", "41"), "PL", "80,70,0")
    ok, stats = vcf_rows_numerically_equivalent([ROW], [b])
    assert ok and stats["max_dgq"] == 1 and stats["max_dpl"] == 1


def test_pl_two_units_fails():
    ok, stats = vcf_rows_numerically_equivalent(
        [ROW], [_mut_sample(ROW, "PL", "80,67,0")])
    assert not ok and "PL" in stats["violations"][0]


def test_discrete_fields_must_be_byte_identical():
    for col, val in ((1, "5002"), (3, "T"), (4, "C"), (6, "LowQual")):
        ok, _ = vcf_rows_numerically_equivalent([ROW], [_mut(ROW, col, val)])
        assert not ok, (col, val)
    ok, stats = vcf_rows_numerically_equivalent(
        [ROW], [_mut_sample(ROW, "GT", "0/1")])
    assert not ok and "GT" in stats["violations"][0]
    ok, _ = vcf_rows_numerically_equivalent(
        [ROW], [_mut_sample(ROW, "AD", "1,29")])
    assert not ok


def test_extra_row_fails_without_flip_budget():
    other = _mut(_mut(ROW, 1, "7777"), 7, "F")
    ok, stats = vcf_rows_numerically_equivalent([ROW], [ROW, other])
    assert not ok and stats["flips"] == 1


def test_lone_confident_variant_fails_even_within_budget():
    # a one-sided HIGH-QUAL variant row is a dropped/extra call, not a
    # routing artifact: must fail regardless of flip_budget
    lone = _mut(ROW, 1, "7777")  # QUAL 40.24, GT 1/1
    ok, stats = vcf_rows_numerically_equivalent([ROW, lone], [ROW],
                                                flip_budget=1.0)
    assert not ok and "not a routing artifact" in stats["violations"][0]
    # ... but a low-QUAL lone row or a lone ref call IS budgetable
    low = _mut(_mut(ROW, 1, "7777"), 5, "8.10")
    ok, _ = vcf_rows_numerically_equivalent([ROW, low], [ROW],
                                            flip_budget=1.0)
    assert ok
    refcall = _mut_sample(_mut(_mut(ROW, 1, "7778"), 6, "RefCall"),
                          "GT", "0/0")
    ok, _ = vcf_rows_numerically_equivalent([ROW, refcall], [ROW],
                                            flip_budget=1.0)
    assert ok


def test_non_pf_info_difference_fails_even_within_budget():
    # only the P<->F source tag may flip; any other INFO delta is a
    # regression (e.g. a changed annotation), never budgetable
    other = _mut(ROW, 7, "P;X=1")
    ok, stats = vcf_rows_numerically_equivalent([ROW], [other],
                                                flip_budget=1.0)
    assert not ok and "not a P/F routing flip" in stats["violations"][0]


def test_routing_flip_within_budget_passes_if_call_agrees():
    # INFO P vs F with different QUAL/GQ/PL but same REF/ALT/GT: a
    # routing-boundary flip, allowed under the budget
    flipped = _mut(_mut_sample(_mut(ROW, 7, "F"), "GQ", "18"), 5, "18.25")
    ok, stats = vcf_rows_numerically_equivalent([ROW], [flipped],
                                                flip_budget=1.0)
    assert ok and stats["flips"] == 1
    # ... but NOT if the flip changes the genotype
    bad = _mut_sample(flipped, "GT", "0/1")
    ok, stats = vcf_rows_numerically_equivalent([ROW], [bad], flip_budget=1.0)
    assert not ok and "changed the call" in stats["violations"][0]
    # ... and not beyond the budget
    ok, _ = vcf_rows_numerically_equivalent([ROW], [flipped], flip_budget=0.0)
    assert not ok
