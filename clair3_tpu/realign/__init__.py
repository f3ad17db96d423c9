from clair3_tpu.realign.realigner import (  # noqa: F401
    realign_reads_in_region,
    realign_bam_region,
    select_realignment_windows,
)
from clair3_tpu.realign.dbg import consensus_haplotypes  # noqa: F401
from clair3_tpu.realign.align import affine_local_align  # noqa: F401
