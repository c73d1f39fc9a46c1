from amcpy_tpu.data import io_mat, synth

__all__ = ["io_mat", "synth"]
