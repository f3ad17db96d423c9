import pytest

from clair3_tpu.task import (
    GT21,
    GT21_LABELS,
    VariantLength,
    gt21_enum_from,
    gt21_enum_from_label,
    genotype_enum_for_task,
    genotype_enum_from,
    mix_two_partial_labels,
    output_labels_from_reference,
    output_labels_from_vcf_columns,
    partial_label_from,
)
from clair3_tpu.task.labels import Genotype


def test_gt21_label_space():
    assert len(GT21_LABELS) == 21
    assert GT21_LABELS[GT21.AA] == "AA"
    assert GT21_LABELS[GT21.InsDel] == "InsDel"
    assert gt21_enum_from_label("CT") == GT21.CT


def test_partial_labels():
    assert partial_label_from("A", "ACG") == "Ins"
    assert partial_label_from("ACG", "A") == "Del"
    assert partial_label_from("A", "T") == "T"


@pytest.mark.parametrize(
    "l1,l2,expected",
    [
        ("A", "C", "AC"),
        ("C", "A", "AC"),
        ("T", "T", "TT"),
        ("A", "Del", "ADel"),
        ("Ins", "G", "GIns"),
        ("Ins", "Ins", "InsIns"),
        ("Del", "Del", "DelDel"),
        ("Ins", "Del", "InsDel"),
        ("Del", "Ins", "InsDel"),
    ],
)
def test_mix_two_partial_labels(l1, l2, expected):
    assert mix_two_partial_labels(l1, l2) == expected


def test_gt21_enum_from_het_snp():
    # 0/1 SNP A->T
    assert gt21_enum_from("A", "T", 0, 1) == GT21.AT
    # hom SNP C->G
    assert gt21_enum_from("C", "G", 1, 1) == GT21.GG
    # het insertion
    assert gt21_enum_from("A", "ATT", 0, 1) == GT21.AIns
    # hom deletion
    assert gt21_enum_from("ATT", "A", 1, 1) == GT21.DelDel
    # multiallelic SNP pair
    assert gt21_enum_from("A", "C,G", 1, 2) == GT21.CG


def test_genotype_enums():
    assert genotype_enum_from(0, 0) == Genotype.homo_reference
    assert genotype_enum_from(1, 1) == Genotype.homo_variant
    assert genotype_enum_from(0, 1) == Genotype.hetero_variant
    assert genotype_enum_from(1, 2) == Genotype.hetero_variant_multi
    assert genotype_enum_for_task(Genotype.hetero_variant_multi) == Genotype.hetero_variant


def test_output_labels_from_reference():
    vec = output_labels_from_reference("A")
    assert len(vec) == 90
    assert vec[GT21.AA] == 1
    assert vec[21 + Genotype.homo_reference] == 1
    assert vec[24 + VariantLength.index_offset] == 1
    assert vec[57 + VariantLength.index_offset] == 1
    assert sum(vec) == 4


def test_output_labels_from_vcf_columns_het_ins():
    # ctg pos ref alt gt1 gt2
    vec = output_labels_from_vcf_columns(["chr1", "100", "A", "ATT", "0", "1"])
    assert vec[GT21.AIns] == 1
    assert vec[21 + Genotype.hetero_variant] == 1
    # lengths sorted: [0, +2]
    assert vec[24 + 0 + 16] == 1
    assert vec[57 + 2 + 16] == 1


def test_output_labels_from_vcf_columns_multiallelic_del():
    vec = output_labels_from_vcf_columns(["chr1", "5", "ATT", "A,AT", "1", "2"])
    assert vec[GT21.DelDel] == 1
    assert vec[21 + Genotype.hetero_variant] == 1
    assert vec[24 + (-2) + 16] == 1
    assert vec[57 + (-1) + 16] == 1
