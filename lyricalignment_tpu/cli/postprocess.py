"""Result-JSON postprocessing CLI.

Re-design of the reference's ``utils/postprocess.py`` (`:27-41`): rewrite
each result file in place, converting every ``inference`` field to
simplified Chinese and stripping spaces and English letters.

Usage:
    python -m lyricalignment_tpu.cli.postprocess -f result1.json [result2.json ...]
"""

from __future__ import annotations

import argparse
import json

from lyricalignment_tpu.text.normalize import remove_english, to_simplified


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-file", "-f", nargs="+", required=True)
    p.add_argument("--key", default="inference")
    return p.parse_args()


def postprocess_entry(text: str) -> str:
    return remove_english(to_simplified(text).replace(" ", ""))


def main():
    args = parse_args()
    for file in args.input_file:
        with open(file, "r", encoding="utf-8") as f:
            data = json.load(f)
        for entry in data:
            entry[args.key] = postprocess_entry(entry[args.key])
        with open(file, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=4, ensure_ascii=False)


if __name__ == "__main__":
    main()
