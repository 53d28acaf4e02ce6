"""Text preprocessing chain — the textual analog of the reference's
enhance -> denoise -> deskew -> binarize image pipeline
(/root/reference/backend/app/services/preprocessing_service.py:82-133).

Per SURVEY.md section 2.3 the semantic mapping is:

- enhance  ~= encoding repair / unicode normalization (E1-E8)
- denoise  ~= control-char & junk stripping (D1-D9)
- deskew   ~= whitespace re-flow / line re-ordering (K1-K6); like the
  reference's ``rotate_image`` identity shortcut (deskewer.py:196-198)
  it is a no-op on already-clean text
- binarize ~= thresholding: drop residual lines below a minimum
  length of *content* characters (B1-B9)

Each step is gated by a config toggle (reference settings.py:47-51)
and appends its name to ``steps_applied`` — the lineage metadata the
reference accumulates at preprocessing_service.py:98-127.

Deterministic and idempotent on clean input (the byte-identity
contract depends on this).
"""

from __future__ import annotations

import unicodedata


def _enhance(text: str) -> str:
    # unicode normalization + BOM/zero-width removal (encoding repair)
    text = unicodedata.normalize("NFC", text)
    return text.replace("﻿", "").replace("​", "")


def _denoise(text: str) -> str:
    # strip control chars except \n and \t (junk-pixel analog)
    return "".join(c for c in text if c == "\n" or c == "\t" or unicodedata.category(c)[0] != "C")


def _deskew(text: str) -> str:
    # re-flow: collapse runs of spaces/tabs within lines; preserve line
    # structure. Identity on already-flowed text (rotate shortcut analog).
    return "\n".join(" ".join(line.split()) for line in text.split("\n"))


def _binarize(text: str, min_line_chars: int = 1) -> str:
    # threshold: drop lines with fewer than min_line_chars non-space chars
    kept = [ln for ln in text.split("\n") if len(ln.replace(" ", "")) >= min_line_chars]
    return "\n".join(kept)


def preprocess_text(
    text: str,
    enable_enhance: bool = True,
    enable_denoise: bool = True,
    enable_deskew: bool = True,
    enable_binarize: bool = True,
) -> tuple[str, list[str]]:
    """Returns (processed_text, steps_applied)."""
    steps: list[str] = []
    if enable_enhance:
        text = _enhance(text)
        steps.append("enhance")
    if enable_denoise:
        text = _denoise(text)
        steps.append("denoise")
    if enable_deskew:
        text = _deskew(text)
        steps.append("deskew")
    if enable_binarize:
        text = _binarize(text)
        steps.append("binarize")
    return text, steps
