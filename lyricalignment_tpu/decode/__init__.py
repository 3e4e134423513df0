from lyricalignment_tpu.decode.beam import beam_search, greedy_decode

__all__ = ["beam_search", "greedy_decode"]
