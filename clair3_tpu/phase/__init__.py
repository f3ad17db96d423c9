from clair3_tpu.phase.phaser import ReadBackedPhaser  # noqa: F401
