from clair3_tpu.models.pileup import PileupNet  # noqa: F401
from clair3_tpu.models.full_alignment import FullAlignmentNet  # noqa: F401
from clair3_tpu.models.fb import FullAlignmentBinaryNet  # noqa: F401
