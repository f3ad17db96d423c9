from clair3_tpu.phase.phaser import ReadBackedPhaser, refine_mec  # noqa: F401
