#!/usr/bin/env python3
"""Refresh the bundled public-suffix list snapshot (r18 verdict item:
the PSL changes monthly; without tooling the snapshot silently ages).

The build container has zero egress, so the fetch is a separate step
run wherever network access exists:

    curl -fsSLO https://publicsuffix.org/list/public_suffix_list.dat
    python3 tools/refresh_psl.py public_suffix_list.dat

The script VALIDATES the downloaded list (structure + rule-class
floors + sentinel rules — the same classes PublicSuffixSpec's drift
gate samples), prepends a provenance header (snapshot date + sha256),
and installs it at src/main/resources/graft/public_suffix_list.dat.
Run `sbt "testOnly graft.functions.PublicSuffixSpec"` afterwards: the
drift spec re-checks the installed snapshot, so a truncated or
mangled download can never ship.

Provenance: the list is public data from publicsuffix.org (Mozilla
Public License 2.0 — the license header rides along in the file).
"""
import hashlib
import re
import sys
from datetime import date, timezone
from pathlib import Path

DEST = Path(__file__).resolve().parent.parent / \
    "src/main/resources/graft/public_suffix_list.dat"

# one PSL rule: optional '!' (exception) or '*.' (wildcard), then
# dot-separated labels — ASCII LDH or IDN U-labels (any non-ASCII)
RULE = re.compile(r"^(!|\*\.)?(?:[^\s./!*]+)(?:\.[^\s./!*]+)*$")

# sentinels the drift spec also pins: one per rule class, chosen for
# stability (these have been in the list for a decade+)
SENTINELS_EXACT = ["com", "co.uk", "github.io", "blogspot.com"]
SENTINEL_WILDCARD = "*.bd"
SENTINEL_EXCEPTION = "!city.kawasaki.jp"

# floors well under the current counts (9.5k rules, 107 wildcards,
# 8 exceptions, 466 IDN rules) but far above any truncated download
FLOORS = {"rules": 9000, "wildcard": 80, "exception": 5, "idn": 300}


def validate(lines):
    rules, wild, exc, idn = [], 0, 0, 0
    saw_icann = saw_private = False
    for i, raw in enumerate(lines, 1):
        line = raw.strip()
        if "===BEGIN ICANN DOMAINS===" in line:
            saw_icann = True
        if "===BEGIN PRIVATE DOMAINS===" in line:
            saw_private = True
        if not line or line.startswith("//"):
            continue
        if not RULE.match(line):
            raise SystemExit(f"line {i}: not a valid PSL rule: {line!r}")
        rules.append(line)
        if line.startswith("*."):
            wild += 1
        elif line.startswith("!"):
            exc += 1
        if any(ord(c) > 127 for c in line):
            idn += 1
    if not (saw_icann and saw_private):
        raise SystemExit("section markers missing - not the official list?")
    counts = {"rules": len(rules), "wildcard": wild,
              "exception": exc, "idn": idn}
    for k, floor in FLOORS.items():
        if counts[k] < floor:
            raise SystemExit(
                f"{k} count {counts[k]} under floor {floor} - "
                "truncated or mangled download?")
    ruleset = set(rules)
    for s in SENTINELS_EXACT:
        if s not in ruleset:
            raise SystemExit(f"sentinel rule missing: {s}")
    if SENTINEL_WILDCARD not in ruleset:
        raise SystemExit(f"sentinel wildcard missing: {SENTINEL_WILDCARD}")
    if SENTINEL_EXCEPTION not in ruleset:
        raise SystemExit(f"sentinel exception missing: {SENTINEL_EXCEPTION}")
    return counts


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    src = Path(sys.argv[1])
    data = src.read_bytes()
    text = data.decode("utf-8")
    lines = text.splitlines()
    # strip any prior graft provenance header before re-validating
    lines = [l for l in lines if not l.startswith("// graft PSL snapshot:")]
    counts = validate(lines)
    sha = hashlib.sha256(data).hexdigest()[:16]
    today = date.today().isoformat()
    header = (f"// graft PSL snapshot: {today} sha256:{sha} "
              "from https://publicsuffix.org/list/public_suffix_list.dat "
              "(refreshed by tools/refresh_psl.py)")
    DEST.write_text(header + "\n" + "\n".join(lines) + "\n",
                    encoding="utf-8")
    print(f"installed {DEST}")
    print(f"  {counts['rules']} rules ({counts['wildcard']} wildcard, "
          f"{counts['exception']} exception, {counts['idn']} IDN)")
    print("now run: sbt 'testOnly graft.functions.PublicSuffixSpec'")


if __name__ == "__main__":
    main()
