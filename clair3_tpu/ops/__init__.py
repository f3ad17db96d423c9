from clair3_tpu.ops.lstm import BiLSTM  # noqa: F401
