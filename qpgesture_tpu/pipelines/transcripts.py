"""Transcript handling: gentle forced-aligner JSON and the BEAT tab format.

The reference runs gentle (a Kaldi C++ service) to align words to audio
(process/process_beat_txt.py:16-81) and stores per-recording transcripts as
tab-separated '(start)\t(end)\tword' lines. Gentle itself stays a host-side
external tool (SURVEY §2.9); this module reads both of its output formats.
"""
from __future__ import annotations

import json
from typing import List, Tuple

Word = Tuple[float, float, str]


def read_gentle_json(path: str) -> List[Word]:
    """gentle's JSON: {'words': [{'case': 'success', 'start': s, 'end': e,
    'alignedWord'/'word': w}, ...]} -> [(start, end, word)]."""
    with open(path) as f:
        data = json.load(f)
    out: List[Word] = []
    for w in data.get("words", []):
        if w.get("case") != "success":
            continue
        out.append((float(w["start"]), float(w["end"]),
                    w.get("alignedWord") or w.get("word", "")))
    return out


def read_tab_transcript(path: str) -> List[Word]:
    """The reference's Transcripts/*.txt format: 'start\tend\tword' per line
    (make_txt_dataset, make_beat_dataset.py:491-497)."""
    out: List[Word] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) < 3:
                continue
            out.append((float(parts[0]), float(parts[1]), parts[2]))
    return out


def write_tab_transcript(path: str, words: List[Word]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for (s, e, w) in words:
            f.write(f"{s}\t{e}\t{w}\n")


def normalize_word(word: str) -> str:
    """String normalizer (process/utils/data_utils.py:15): lowercase,
    strip non-alphanumerics except apostrophes."""
    return "".join(ch for ch in word.lower()
                   if ch.isalnum() or ch == "'").strip()
