"""Result-JSON postprocessing CLI.

Re-design of the reference's ``utils/postprocess.py`` (`:27-41`): rewrite
each result file in place, converting every ``inference`` field to
simplified Chinese and stripping spaces and English letters.

``--t2s-overrides`` merges extra traditional->simplified pairs over the
embedded table; ``--strict-normalize`` exits non-zero when any character
survives conversion with no t2s entry (a candidate for silent divergence
from the reference's ``chinese_converter`` — without the flag such
characters warn to stderr).

Usage:
    python -m lyricalignment_tpu.cli.postprocess -f result1.json [result2.json ...]
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, Optional

from lyricalignment_tpu.text.normalize import (
    format_gap_report, load_t2s_overrides, normalization_gaps,
    remove_english, to_simplified)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-file", "-f", nargs="+", required=True)
    p.add_argument("--key", default="inference")
    p.add_argument("--t2s-overrides", type=str, default=None,
                   help="JSON {traditional: simplified} pairs merged over "
                        "the embedded t2s table")
    p.add_argument("--strict-normalize", action="store_true",
                   help="exit non-zero if any character survives conversion "
                        "with no t2s entry (default: warn to stderr)")
    return p.parse_args()


def postprocess_entry(text: str,
                      t2s_overrides: Optional[Dict[str, str]] = None) -> str:
    return remove_english(
        to_simplified(text, overrides=t2s_overrides).replace(" ", ""))


def main():
    args = parse_args()
    t2s = load_t2s_overrides(args.t2s_overrides) if args.t2s_overrides else None
    gaps: Dict[str, int] = {}
    for file in args.input_file:
        with open(file, "r", encoding="utf-8") as f:
            data = json.load(f)
        for entry in data:
            entry[args.key] = postprocess_entry(entry[args.key], t2s)
            for ch, n in normalization_gaps(entry[args.key]).items():
                gaps[ch] = gaps.get(ch, 0) + n
        with open(file, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=4, ensure_ascii=False)
    if gaps:
        print(format_gap_report(gaps, anchor="outside the t2s table",
                                remedy="extend coverage with --t2s-overrides"),
              file=sys.stderr)
        if args.strict_normalize:
            raise SystemExit(2)


if __name__ == "__main__":
    main()
