from lyricalignment_tpu.text.pinyin import (
    PronunciationTable,
    load_pronunciation_table,
    split_syllable,
)
from lyricalignment_tpu.text.normalize import remove_english, to_simplified

__all__ = [
    "PronunciationTable",
    "load_pronunciation_table",
    "split_syllable",
    "remove_english",
    "to_simplified",
]
