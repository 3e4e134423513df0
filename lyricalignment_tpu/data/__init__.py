from lyricalignment_tpu.data.records import Record, read_data
from lyricalignment_tpu.data.audio_io import load_audio_file
from lyricalignment_tpu.data.frames import rasterize_frame_labels

__all__ = ["Record", "read_data", "load_audio_file", "rasterize_frame_labels"]
