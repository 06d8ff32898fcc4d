"""Go-parity text normalization (reference: extractor.go:449-460).

The byte-identity contract (SURVEY.md section 1.3) requires reproducing
``normalizeText`` exactly, including:

- the **Go** whitespace class (``unicode.IsSpace``), NOT Python's
  ``str.split()`` class — Python additionally treats U+001C-U+001F as
  whitespace, Go does not;
- the ``bufio.Scanner`` 64 KiB max-token rule: a line (the bytes between
  ``\\n``'s) longer than the scanner limit makes ``Scan()`` return false and
  ``normalizeText`` never checks ``scanner.Err()`` — so that line AND
  everything after it is silently dropped.
"""

from __future__ import annotations

import re

# unicode.IsSpace: '\t' '\n' '\v' '\f' '\r' ' ' U+0085 U+00A0 plus the
# Unicode space categories Zs (U+1680, U+2000-200A, U+202F, U+205F, U+3000),
# Zl (U+2028) and Zp (U+2029).
GO_SPACE_CHARS = (
    "\t\n\x0b\x0c\r \x85\xa0"
    "\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)

_GO_WS_RUN = re.compile("[" + GO_SPACE_CHARS + "]+")

# bufio.MaxScanTokenSize — the scanner buffer can hold at most 65536 bytes;
# for an interior line the trailing '\n' must also fit (=> content <= 65535),
# for the final segment (EOF, no '\n') the full 65536 fits.
_SCAN_MAX_INTERIOR = 64 * 1024 - 1
_SCAN_MAX_FINAL = 64 * 1024


def go_trim_space(s: str) -> str:
    """strings.TrimSpace with the Go whitespace class."""
    return s.strip(GO_SPACE_CHARS)


def go_fields(s: str) -> list[str]:
    """strings.Fields with the Go whitespace class."""
    return [f for f in _GO_WS_RUN.split(s) if f]


def _scan_lines(data: bytes) -> list[bytes]:
    """bufio.Scanner + ScanLines semantics over UTF-8 bytes.

    Returns the tokens produced before the scanner stops — either cleanly at
    EOF or with ErrTooLong (which the reference ignores, dropping the rest).
    ScanLines drops a trailing '\\r' from each token.
    """
    lines: list[bytes] = []
    start = 0
    n = len(data)
    while start < n:
        idx = data.find(b"\n", start)
        if idx == -1:
            seg = data[start:]
            if len(seg) > _SCAN_MAX_FINAL:  # ErrTooLong on the last segment
                return lines
            if seg.endswith(b"\r"):
                seg = seg[:-1]
            lines.append(seg)
            return lines
        seg = data[start:idx]
        if len(seg) > _SCAN_MAX_INTERIOR:  # ErrTooLong: drop line + rest
            return lines
        if seg.endswith(b"\r"):
            seg = seg[:-1]
        lines.append(seg)
        start = idx + 1
    return lines


def normalize_text(text: str) -> str:
    """Reference ``normalizeText`` (extractor.go:449-460), byte-identical.

    Scan lines (64 KiB rule), TrimSpace each, drop empties, join with ' ',
    then collapse every Go-whitespace run to one ASCII space via
    strings.Fields + Join.
    """
    parts: list[str] = []
    for seg in _scan_lines(text.encode("utf-8")):
        line = go_trim_space(seg.decode("utf-8", errors="surrogateescape"))
        if line:
            parts.append(line)
    # builder joins with a trailing space; Fields/Join make it irrelevant
    return " ".join(go_fields(" ".join(parts)))


def tokenize(text: str) -> list[str]:
    """Dedup tokenizer: Go-whitespace fields of the normalized text.

    On already-normalized ``text`` (the pipeline invariant) this is a plain
    ASCII-space split; defined via go_fields so raw text behaves too.
    """
    return go_fields(text)
