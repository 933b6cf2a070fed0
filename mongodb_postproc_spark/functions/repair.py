"""Payload repair chain — the U3 kernel.

Pure-python string surgery mirroring the reference's largest kernel, the
CIF repair battery (/root/reference/cifEditor.py:11-135,
/root/reference/fix_incorrect_structures.py:11-229): a structured text
payload whose site loop contains malformed rows — quoted multi-element
labels like ``'Fe 0.3 + Ni 0.6'`` — is repaired by commenting the bad row
out and emitting one well-formed row per element, renormalizing the last
occupancy so the site sums to 1 (cifEditor.py:88-135). When that first
attempt still does not parse, the second attempt comments the offending
rows out entirely (the 2-attempt fallback of cifEditor.py:60-85), and the
caller coalesces: ``repaired = attempt1 if parses else attempt2``.

These functions are deliberately free of Spark so they are unit-testable
against golden strings; operators/records.py wraps them in an
Arrow-batched mapInPandas stage (the payload surgery is inherently
line-oriented — the reference kernel is a per-line loop — but batches
amortize transfer and the downstream re-parse/aggregation is native Spark).
"""

from __future__ import annotations

import re

_QUOTED = re.compile(r"'(.+?)'")
_OCC = re.compile(r"\.?\d+")
_ELEM = re.compile(r"\D+")


def parse_ok(payload: str) -> bool:
    """The parse-check the reference delegates to CifParser: every
    non-comment site row (rows after the ``loop_`` header block) must have
    5 whitespace-separated fields with a float occupancy in field 5."""
    in_loop = False
    for line in payload.splitlines():
        s = line.strip()
        if s == "loop_":
            in_loop = True
            continue
        if not in_loop or not s or s.startswith(("#", "_")):
            continue
        fields = s.split()
        if len(fields) != 5:
            return False
        try:
            float(fields[4])
        except ValueError:
            return False
    return True


def repair_attempt1(payload: str) -> str:
    """cifEditor.handle_partialocclables semantics: comment the malformed
    quoted-label row, expand it to one row per element with the label's
    occupancies, renormalize the LAST occupancy to 1 - sum(others) when
    the listed occupancies don't sum to 1 (cifEditor.py:112-121)."""
    out: list[str] = []
    for line in payload.splitlines():
        if " + " in line and len(line) < 150:
            out.append("#" + line)
            try:
                label = _QUOTED.findall(line)[0]
                parts = label.split("+")
                elems, occs = [], []
                for p in parts:
                    p = p.strip()
                    occs.append(float("0" + _OCC.findall(p)[1]))
                    elems.append(_ELEM.findall(p)[0].strip())
                if abs(sum(occs) - 1.0) > 1e-9:
                    occs[-1] = 1.0 - sum(occs[:-1])
                rest = line.replace(f"'{label}'", "").split()
                coords = rest[:3]
                for el, occ in zip(elems, occs):
                    out.append(" ".join([el, *coords, f"{occ:g}"]))
            except (IndexError, ValueError):
                # unexpandable label: leave only the commented row; the
                # parse-check decides whether attempt 2 is needed
                continue
        else:
            out.append(line)
    return "\n".join(out)


def repair_attempt2(payload: str) -> str:
    """Fallback (cifEditor.py:60-85 second attempt): comment out every site
    row that would still fail the parse — the structure loses those sites
    but becomes parseable by construction."""
    out = []
    in_loop = False
    for line in payload.splitlines():
        s = line.strip()
        if s == "loop_":
            in_loop = True
            out.append(line)
            continue
        bad = False
        if in_loop and s and not s.startswith(("#", "_")):
            fields = s.split()
            if len(fields) != 5:
                bad = True
            else:
                try:
                    float(fields[4])
                except ValueError:
                    bad = True
        out.append("#" + line if bad else line)
    return "\n".join(out)


def repair_chain(payload: str) -> tuple[str, int]:
    """(repaired_payload, attempt_used): 0 = already parses, 1 = first
    attempt (expand labels), 2 = fallback (comment out). The coalesce of
    the reference's try/except ladder."""
    if parse_ok(payload):
        return payload, 0
    a1 = repair_attempt1(payload)
    if parse_ok(a1):
        return a1, 1
    return repair_attempt2(a1), 2
