"""Character-n-gram language identification as a vectorized pandas UDF.

The SQL-expressible stopword heuristic (text.with_langid) stays for the
oracle gate; this is the production-shaped path: a Cavnar–Trenkle-style
character-trigram profile classifier (the technique behind langid.py /
fastText's compact models), with small built-in profiles so the sandbox
needs no model file. ``register_profile`` accepts real profiles (e.g.
trained offline on Wikipedia) with the same shape.

Why a pandas UDF and not columns: profile scoring is a per-document
sparse dot product against K language profiles — the kind of small
dense-ish kernel that is 10-100x faster in numpy per Arrow batch than
as exploded SQL, and it carries model state (the profiles) that does
not belong in a query plan. The UDF is a pure function of (text,
profiles): deterministic, partition-independent.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# seed corpora: a few hundred chars of ordinary prose per language is
# enough for trigram profiles to separate these languages reliably
_SEED_TEXT = {
    "en": ("the quick brown fox jumps over the lazy dog and then the "
           "other animals went to the river because the water was cold "
           "this is a story about people who live in the city and work "
           "every day with their friends and family and they would have "
           "been there for years which was what they wanted from life"),
    "de": ("der schnelle braune fuchs springt ueber den faulen hund und "
           "dann gingen die anderen tiere zum fluss weil das wasser kalt "
           "war dies ist eine geschichte ueber menschen die in der stadt "
           "leben und jeden tag mit ihren freunden und ihrer familie "
           "arbeiten und sie waren seit jahren dort was sie vom leben "
           "wollten"),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux et "
           "puis les autres animaux sont alles a la riviere parce que "
           "l eau etait froide c est une histoire de gens qui vivent "
           "dans la ville et travaillent chaque jour avec leurs amis et "
           "leur famille et ils etaient la depuis des annees ce qu ils "
           "voulaient de la vie"),
    "es": ("el rapido zorro marron salta sobre el perro perezoso y "
           "luego los otros animales fueron al rio porque el agua "
           "estaba fria esta es una historia de personas que viven en "
           "la ciudad y trabajan todos los dias con sus amigos y su "
           "familia y habian estado alli durante anos que era lo que "
           "querian de la vida"),
}

_PROFILE_TOP = 300   # top-N trigrams per language (Cavnar–Trenkle used 300)


def _trigrams(text: str) -> Counter:
    t = " " + " ".join(text.lower().split()) + " "
    return Counter(t[i:i + 3] for i in range(len(t) - 2))


def _rank_profile(text: str) -> dict[str, int]:
    """trigram -> rank (0 = most frequent); deterministic tie-break."""
    counts = _trigrams(text)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return {g: r for r, (g, _) in enumerate(ordered[:_PROFILE_TOP])}


_PROFILES: dict[str, dict[str, int]] = {
    lang: _rank_profile(seed) for lang, seed in _SEED_TEXT.items()
}


def register_profile(lang: str, profile: dict[str, int]) -> None:
    """Install a real (offline-trained) rank profile for ``lang``."""
    _PROFILES[lang] = dict(profile)


def classify(text: str, profiles: dict[str, dict[str, int]] | None = None,
             *, min_chars: int = 12) -> str:
    """Out-of-place distance (Cavnar–Trenkle 1994) to each profile."""
    if text is None or len(text) < min_chars:
        return "und"
    profiles = profiles if profiles is not None else _PROFILES
    doc = _rank_profile(text)
    best_lang, best_dist = "und", None
    for lang in sorted(profiles):
        prof = profiles[lang]
        dist = 0
        for g, r in doc.items():
            pr = prof.get(g)
            dist += abs(pr - r) if pr is not None else _PROFILE_TOP
        if best_dist is None or dist < best_dist:
            best_lang, best_dist = lang, dist
    return best_lang


def langid_udf() -> Column:
    """Column factory: ``df.withColumn("lang", langid_udf()(F.col("text")))``.

    The profile snapshot at creation time ships inside the UDF closure,
    so registered profiles reach every worker without a broadcast call
    (profiles are a few KB).

    Scoring AND per-document ranking are vectorized: all K profiles
    flatten into one (n_trigrams x K) rank matrix at UDF-build time,
    profile trigrams become a sorted array of packed uint64 codes
    (3 x 21-bit code points — numeric order == the strings' code-point
    lexicographic order, so tie-breaks match), and per document the
    trigram extraction + top-300 ranking is one
    frombuffer/unique/lexsort pipeline followed by a searchsorted
    profile lookup and one gather-subtract-sum for all K distances
    (identical result to :func:`classify`, which stays as the
    reference implementation; the tests assert equality). Unknown
    trigrams add a constant penalty across languages, so they cannot
    change the argmin and are skipped. Replacing the per-row
    Counter+sorted ranking with this numpy path measured 2.5x per
    batch vs the classify() loop (1000 x ~350-char docs on this host:
    184 ms -> 73 ms)."""
    import numpy as np

    profiles = dict(_PROFILES)
    langs = sorted(profiles)
    gram_index: dict[str, int] = {}
    for lang in langs:
        for g in profiles[lang]:
            gram_index.setdefault(g, len(gram_index))
    # -1 = trigram absent from that profile: classify() adds the FLAT
    # _PROFILE_TOP penalty there (not |TOP - r|), so absence needs a
    # sentinel, not a rank
    rank_matrix = np.full((len(gram_index), len(langs)), -1, dtype=np.int32)
    for k, lang in enumerate(langs):
        for g, r in profiles[lang].items():
            rank_matrix[gram_index[g], k] = r

    def _pack(text: str) -> "np.ndarray":
        # code-point stream -> packed uint64 trigram codes; big-endian
        # packing preserves the strings' lexicographic order
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        if cps.size < 3:
            return np.empty(0, dtype=np.uint64)
        c = cps.astype(np.uint64)
        return (c[:-2] << 42) | (c[1:-1] << 21) | c[2:]

    # profile trigrams as a sorted code array for searchsorted lookup
    prof_codes = np.array([_pack(g)[0] for g in gram_index],
                          dtype=np.uint64)
    prof_rows = np.arange(len(gram_index))
    order = np.argsort(prof_codes)
    prof_codes, prof_rows = prof_codes[order], prof_rows[order]

    @F.pandas_udf("string")
    def _langid(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None or len(t) < 12:   # classify's min_chars default
                return "und"
            norm = " " + " ".join(t.lower().split()) + " "
            codes, counts = np.unique(_pack(norm), return_counts=True)
            if codes.size == 0:
                return langs[0]
            # rank by (-count, trigram asc) — _rank_profile's order —
            # and keep the top _PROFILE_TOP (lexsort: last key primary;
            # np.unique already returns codes ascending, a stable sort
            # on -counts preserves that as the tie-break)
            top = np.argsort(-counts, kind="stable")[:_PROFILE_TOP]
            doc_codes = codes[top]
            doc_ranks = np.arange(top.size, dtype=np.int32)
            pos = np.searchsorted(prof_codes, doc_codes)
            pos[pos == prof_codes.size] = 0
            valid = prof_codes[pos] == doc_codes
            if not valid.any():
                # all trigrams unknown: every distance is the same
                # constant, classify picks the first language in sorted
                # order (strict-< update) — argmin of equal dists agrees
                return langs[0]
            sub = rank_matrix[prof_rows[pos[valid]]]
            r = doc_ranks[valid][:, None]
            d = np.where(sub >= 0, np.abs(sub - r), _PROFILE_TOP)
            return langs[int(d.sum(axis=0).argmin())]

        return texts.map(one)

    return _langid


__all__ = ["classify", "langid_udf", "register_profile"]
