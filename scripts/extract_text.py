#!/usr/bin/env python
"""CLI: extract text / words / tables / metadata from one document.

Mirror of the reference's cmd/extract_text and cmd/compare_accurate
debugging tools (/root/reference/cmd/), over the canonical kernel.

  python scripts/extract_text.py FILE [--words] [--tables] [--meta]
         [--password PW] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--words", action="store_true")
    ap.add_argument("--tables", action="store_true")
    ap.add_argument("--meta", action="store_true")
    ap.add_argument("--password", default="")
    ap.add_argument("--limit", type=int, default=0, help="first N chars only")
    args = ap.parse_args(argv)

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from pdfplumber_golang_spark import api

    with open(args.file, "rb") as f:
        doc = api.open_bytes(f.read(), password=args.password.encode())

    if args.meta:
        print(json.dumps(doc.metadata()))
        return 0
    if args.words:
        for p in doc.pages:
            for w in p.extract_words():
                print(json.dumps(w))
        return 0
    if args.tables:
        for p in doc.pages:
            for t in p.extract_tables():
                print(json.dumps(t["rows"]))
        return 0
    text = doc.extract_text()
    print(text[: args.limit] if args.limit else text)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
