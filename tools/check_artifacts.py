"""No-phantom-artifacts checker (VERDICT r03 weak #1, mechanized).

Round 3's notes claimed an artifact (`docs/flagship_proof_r03.json`) that
was never produced. Rule since r04: every "done" claim names an artifact
that exists in the same commit. This tool enforces the checkable half:
every `docs/<file>.<ext>` path MENTIONED in the round notes, PERF.md,
PARITY.md and README.md must exist in the tree.

Brace expansion (`docs/bench_stream_device_paste_mb{1,2}_r04.json`) and
glob-ish star mentions (`docs/bench_stream_device_*_r03.json`) are
expanded/checked against the filesystem. Paths struck through with `~~`
(documented phantoms) are exempt.

Run directly or via tests/test_artifacts.py (fast tier).
"""

from __future__ import annotations

import glob
import os
import re
import sys

DOCS = ("README.md", "PARITY.md", "docs/PERF.md", "docs/API.md",
        "docs/R03_NOTES.md", "docs/R04_NOTES.md")

# docs/<name>.<ext> possibly containing {a,b} alternations, * globs, or
# dots in the stem; tolerate ONLY a linebreak split (markdown wrapping) —
# arbitrary spaces would fuse ordinary prose into phantom "paths".
_PATH_RE = re.compile(r"docs/[\w\-{},*.\n]+\.(?:json|png|md)")


def expand(path: str) -> list[str]:
    """Expand {a,b} alternations into concrete paths. Unbalanced braces
    (no matching pair left) pass through unchanged rather than looping."""
    parts = [path]
    while True:
        nxt, changed = [], False
        for p in parts:
            m = re.search(r"\{([^{}]*)\}", p)
            if not m:
                nxt.append(p)
                continue
            changed = True
            for alt in m.group(1).split(","):
                nxt.append(p[:m.start()] + alt + p[m.end():])
        parts = nxt
        if not changed:
            return parts


def check(root: str) -> list[str]:
    missing = []
    for doc in DOCS:
        full = os.path.join(root, doc)
        if not os.path.exists(full):
            continue
        text = open(full).read()
        # drop struck-through (documented-phantom) mentions
        text = re.sub(r"~~[^~]*~~", "", text)
        for raw in _PATH_RE.findall(text):
            path = raw.replace("\n", "")
            for cand in expand(path):
                if "*" in cand:
                    if not glob.glob(os.path.join(root, cand)):
                        missing.append(f"{doc}: {cand} (glob, no match)")
                elif not os.path.exists(os.path.join(root, cand)):
                    missing.append(f"{doc}: {cand}")
    return sorted(set(missing))


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missing = check(root)
    for m in missing:
        print(f"PHANTOM ARTIFACT: {m}", file=sys.stderr)
    print(f"checked {len(DOCS)} docs: "
          f"{'OK' if not missing else f'{len(missing)} missing'}")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
