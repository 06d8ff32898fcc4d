"""Character-n-gram language identification (training-data pipeline op).

A tiny, deterministic n-gram heuristic: score a document's character-trigram
profile against fixed per-language profiles built from embedded seed text
(no external models, no network). Designed for the Arrow batch path:
``langid_scores`` is vectorizable per batch with a shared profile table.

This is the library counterpart of the SQL-oracled ``lang_id_heuristic``
query (stopword-ratio variant); the trigram version handles text whose
vocabulary is unknown.
"""

from __future__ import annotations

from collections import Counter
from math import sqrt

# Minimal seed text per language — function words + common morphology, which
# dominate trigram mass in real text. Deliberately tiny and embedded.
_SEEDS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it was here "
        "that they would have been with this from not all which their about "
        "one can more when there what some other into only time them these"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y entonces "
        "estaba aqui que ellos habrian estado con esto de no todos los que "
        "su sobre uno puede mas cuando hay que algunos otros en solo tiempo"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und dann "
        "war es hier dass sie gewesen waeren mit diesem von nicht alle "
        "welche ihre ueber eine kann mehr wenn es gibt was einige andere"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et puis "
        "il etait ici que ils auraient ete avec ceci de pas tous lesquels "
        "leur sur une peut plus quand il y a ce que certains autres dans"
    ),
}


def _trigram_profile(text: str) -> dict[str, float]:
    t = f"  {text.lower()}  "
    counts = Counter(t[i : i + 3] for i in range(len(t) - 2))
    norm = sqrt(sum(c * c for c in counts.values())) or 1.0
    return {g: c / norm for g, c in counts.items()}


_PROFILES = {lang: _trigram_profile(seed) for lang, seed in _SEEDS.items()}


def langid_scores(text: str) -> dict[str, float]:
    """Cosine similarity of the text's trigram profile vs each language."""
    if not text:
        return {lang: 0.0 for lang in _PROFILES}
    p = _trigram_profile(text)
    out = {}
    for lang, q in _PROFILES.items():
        out[lang] = round(sum(v * q.get(g, 0.0) for g, v in p.items()), 6)
    return out


def detect_language(text: str, min_score: float = 0.05) -> str:
    """Best-scoring language, or 'und' (undetermined) below min_score."""
    scores = langid_scores(text)
    lang = max(scores, key=lambda k: (scores[k], k))
    return lang if scores[lang] >= min_score else "und"
