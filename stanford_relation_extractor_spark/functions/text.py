"""Scalar text functions (SURVEY.md §2g) + the same-entity cascade (J8).

Python forms are used inside Arrow-batched UDFs and unit tests; column
forms (where a built-in exists) are preferred in plans:

* F2 `no_special_chars`  — Utils.noSpecialChars (`common/Utils.java:367-395`)
* F3 token-level Levenshtein — `common/Utils.java:241-290` (string form
  uses the built-in `F.levenshtein`)
* F4 acronym build/match — `entitylinking/AcronymMatcher.java:19-131`
* F5 corporate-suffix strip — `entitylinking/EntityLinker.java:114-133`
  (column form in operators/linking.py)
* J8 `same_entity` — the linker cascade of
  `entitylinking/EntityLinker.java:67-84,189-331`: exact/caseless match,
  acronym match, token-overlap score with type-specific thresholds,
  edit-distance <= 1.
"""

from __future__ import annotations

import re
from functools import lru_cache

CORP_SUFFIX_RX = re.compile(r"\s+(inc|ltd|corp|co|llc|corporation|company)\.?$", re.I)
DETERMINER_RX = re.compile(r"^(the|a|an)\s+", re.I)
_SPECIAL_RX = re.compile(r"[\\\"'-]")


def no_special_chars(s: str) -> str:
    """Strip backslash, quotes and dashes; casefold (Utils.java:367-395)."""
    return _SPECIAL_RX.sub("", s).lower()


def strip_corp(s: str) -> str:
    return CORP_SUFFIX_RX.sub("", DETERMINER_RX.sub("", s.strip()))


# Normalization memos (guide §4.5 heavy-init-once analog at call level):
# the cascade judges each surface against up to `max_block` partners, so
# a surface's normalized form / token split / digit signature is
# recomputed O(block) times both in the driver-local canon twin and in
# the Arrow-batched judges. Bounded LRU keeps executor memory flat on
# real corpora (surfaces per task are far under the cap anyway).
@lru_cache(maxsize=1 << 18)
def _corp_tokens(s: str) -> tuple[str, ...]:
    """strip_corp(s).split() with original case (acronym matching needs
    capitalization)."""
    return tuple(strip_corp(s).split())


@lru_cache(maxsize=1 << 18)
def _norm_parts(s: str) -> tuple[str, tuple[str, ...], str]:
    """(normalized form, its tokens, its digit signature)."""
    n = no_special_chars(strip_corp(s))
    return n, tuple(n.split()), _digits(n)


def acronym(tokens: list[str]) -> str:
    """First letters of capitalized tokens (AcronymMatcher.java:19-64)."""
    return "".join(t[0].upper() for t in tokens if t and t[0].isalpha())


_NON_ALPHA_RX = re.compile(r"[^A-Za-z]")


def is_acronym_of(short: str, long_tokens: list[str]) -> bool:
    """AcronymMatcher.isAcronym: short form == initials of the long form."""
    s = _NON_ALPHA_RX.sub("", short).upper()
    return len(s) > 1 and s == acronym(long_tokens)


def token_levenshtein(a: list[str], b: list[str]) -> int:
    """Edit distance over token sequences (Utils.java:241-290)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


# type-specific token-overlap acceptance thresholds (EntityLinker cascade)
OVERLAP_THRESHOLD = {"PERSON": 0.99, "ORGANIZATION": 0.75}


def same_entity(a: str, b: str, entity_type: str = "ORGANIZATION") -> bool:
    """J8 cascade: returns True when the two surfaces plausibly denote
    one entity. Deterministic, order-independent."""
    na, ta, da = _norm_parts(a)
    nb, tb, db = _norm_parts(b)
    if na == nb:
        return True
    # acronym match (orgs)
    if entity_type == "ORGANIZATION" and (
        is_acronym_of(a.strip(), _corp_tokens(b))
        or is_acronym_of(b.strip(), _corp_tokens(a))
    ):
        return True
    # token containment / overlap score
    inter = len(set(ta) & set(tb))
    denom = min(len(ta), len(tb))
    if denom and inter / denom >= OVERLAP_THRESHOLD.get(entity_type, 0.99) and inter >= 1:
        # PERSON requires shared surname-like final token
        if entity_type != "PERSON" or (ta and tb and ta[-1] == tb[-1]):
            return True
    # near-typo: string edit distance <= 1 on the normalized form —
    # but a DIGIT difference is never a typo ("Org004 Securities" vs
    # "Org009 Securities", "Boeing 737" vs "Boeing 747" are distinct
    # entities one edit apart): require identical digit sequences
    if abs(len(na) - len(nb)) <= 1 and da == db and _lev_le1(na, nb):
        return True
    return False


_NON_DIGIT_RX = re.compile(r"\D+")


def _digits(s: str) -> str:
    return _NON_DIGIT_RX.sub("", s)


def _lev_le1(a: str, b: str) -> bool:
    if a == b:
        return True
    if abs(len(a) - len(b)) > 1:
        return False
    # one substitution
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) <= 1
    # one insertion/deletion
    if len(a) > len(b):
        a, b = b, a
    i = j = diff = 0
    while i < len(a) and j < len(b):
        if a[i] == b[j]:
            i += 1
            j += 1
        else:
            diff += 1
            if diff > 1:
                return False
            j += 1
    return True


_ALT_NAME_VARIANT_RX = re.compile(
    r"\s+(inc|ltd|corp|co|llc|corporation|company|the)\.?\b|[^a-z0-9 ]", re.I
)


def remove_disallowed_alternate_name_variants(name: str) -> str:
    """Utils.removeDisallowedAlternateNameVariants — strip corporate
    designators / punctuation so 'Acme Corp.' ~ 'Acme'."""
    return re.sub(r"\s+", " ", _ALT_NAME_VARIANT_RX.sub("", name.lower())).strip()


def is_valid_alternate_name(name1: str, name2: str) -> bool:
    """F6 Utils.isValidAlternateName (`common/Utils.java:411`): an
    alternate name is valid iff it differs beyond disallowed variants."""
    return remove_disallowed_alternate_name_variants(
        name1
    ) != remove_disallowed_alternate_name_variants(name2)


_YEAR_RX = re.compile(r"^(1[0-9]{3}|2[0-9]{3})$")
_YM_RX = re.compile(r"^(1[0-9]{3}|2[0-9]{3})[-/](\d{1,2})$")
_YMD_RX = re.compile(r"^(1[0-9]{3}|2[0-9]{3})[-/](\d{1,2})[-/](\d{1,2})$")


def normalize_date_slot(value: str) -> str | None:
    """F7 — simplified SUTime/Timex normalization
    (`shallowdive/TextOps.java:360-375`): YEAR -> 'YYYY',
    YEAR-MONTH -> 'YYYY-MM', full date -> 'YYYY-MM-DD'; None when the
    value is not an absolute date."""
    v = value.strip()
    if _YEAR_RX.match(v):
        return v
    m = _YM_RX.match(v)
    if m:
        return f"{m.group(1)}-{int(m.group(2)):02d}"
    m = _YMD_RX.match(v)
    if m:
        return f"{m.group(1)}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
    return None


def blocking_key(name: str) -> str:
    """Candidate-pair blocking key (J8 at scale): normalized last token
    + first character — never O(n^2) pair generation."""
    n, toks, _ = _norm_parts(name)
    if not toks:
        return ""
    return f"{toks[-1]}:{n[:1]}"


def blocking_key_ext(name: str) -> str:
    """Extended blocking key for hot blocks: normalized last token +
    first THREE characters. Real name distributions make the base key
    quadratic ('smith:j'); blocks over the cap re-key here, trading the
    pairs that differ inside the 3-char prefix (same recall trade the
    base key already makes at 1 char)."""
    n, toks, _ = _norm_parts(name)
    if not toks:
        return ""
    return f"{toks[-1]}:{n[:3]}"


def blocking_key_first(name: str) -> str:
    """Secondary ORG blocking key: normalized FIRST token + first char,
    same key space as ``blocking_key`` so "Org003 Securities"
    (first token org003) lands in single-token "Org003"'s block. Nested
    organization names ("Bank of America Securities" vs "Bank of
    America") share no LAST token, so last-token blocking alone never
    pairs them — but the reference's containment cascade
    (EntityLinker token overlap >= 0.75) must see the pair to merge it.
    Empty for single-token names (their last-token key already IS this
    key) — PERSONs never use it: the PERSON cascade requires a shared
    surname (last token), so first-name blocks could never merge."""
    n, toks, _ = _norm_parts(name)
    if len(toks) < 2 or toks[0] == toks[-1]:
        return ""
    return f"{toks[0]}:{n[:1]}"


def blocking_key_first_ext(name: str) -> str:
    """Hot-block re-key for the first-token family (first token + 3-char
    prefix), mirroring ``blocking_key_ext``."""
    n, toks, _ = _norm_parts(name)
    if len(toks) < 2 or toks[0] == toks[-1]:
        return ""
    return f"{toks[0]}:{n[:3]}"
