from lyricalignment_tpu.utils.metrics import cer, per, mae

__all__ = ["cer", "per", "mae"]
