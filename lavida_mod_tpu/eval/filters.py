"""Answer filters and task-specific response parsers.

Re-expresses the answer-processing layer that published-table parity flows
through in the reference's vendored lmms-eval:

  - the generic filter stack (eval/lmms_eval/filters/{extraction,selection,
    transformation}.py + api/filter.py): WhitespaceFilter, RegexFilter,
    MultiChoiceRegexFilter, TakeFirst, composed via FilterEnsemble;
  - MMMU's multi-choice / open-response parsing
    (eval/lmms_eval/tasks/mmmu/utils.py:128-601, itself from the MMMU
    benchmark's eval_utils) — the exact candidate-extraction cascade,
    last-occurrence tie-break, number/string normalization;
  - MME's yes/no parser and the pairwise acc / acc+ aggregate
    (eval/lmms_eval/tasks/mme/utils.py:52-126).

Behavioral divergence from the reference, by design: where MMMU's parser
picks a RANDOM choice when nothing matches (utils.py:426-427), we use a
deterministic seeded draw keyed on the response text, so eval runs are
reproducible without a global-random side channel.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Optional, Sequence

# ---------------------------------------------------------------------------
# generic filter stack
# ---------------------------------------------------------------------------


class Filter:
    """Maps a list (per doc) of lists (per repeat) of responses."""

    def apply(self, resps: list[list[str]], docs: list[dict]) -> list[list]:
        raise NotImplementedError


class WhitespaceFilter(Filter):
    """Drop one leading space per response (filters/extraction.py:11-30)."""

    def apply(self, resps, docs):
        return [[r[1:] if r.startswith(" ") else r for r in inst]
                for inst in resps]


class RegexFilter(Filter):
    """Extract the first regex match, else a fallback token
    (filters/extraction.py:33-73)."""

    def __init__(self, regex_pattern: str = r"#### (\-?[0-9\.\,]+)",
                 group_select: int = 0, fallback: str = "[invalid]"):
        self.regex = re.compile(regex_pattern)
        self.group_select = group_select
        self.fallback = fallback

    def _one(self, resp: str) -> str:
        matches = self.regex.findall(resp)
        if not matches:
            return self.fallback
        m = matches[self.group_select]
        if isinstance(m, tuple):
            m = [x for x in m if x][0]
        return m.strip()

    def apply(self, resps, docs):
        return [[self._one(r) for r in inst] for inst in resps]


class MultiChoiceRegexFilter(RegexFilter):
    """Letter extraction for multiple-choice answers: regex first, then
    match an option's text against doc["choices"] and map it back to its
    letter (filters/extraction.py:76+ semantics, minus the
    ignore-case/punctuation knobs the active tasks leave off)."""

    def __init__(self, regex_pattern: str = r"\b([A-Z])\b",
                 group_select: int = 0, fallback: str = "[invalid]"):
        super().__init__(regex_pattern, group_select, fallback)

    def apply(self, resps, docs):
        out = []
        for inst, doc in zip(resps, docs):
            choices = list(doc.get("choices") or ())
            letters = [chr(ord("A") + i) for i in range(len(choices))]
            filtered = []
            for resp in inst:
                m = self._one(resp)
                if m == self.fallback and choices:
                    low = resp.lower()
                    for letter, text in zip(letters, choices):
                        if str(text).lower() in low:
                            m = letter
                            break
                filtered.append(m)
            out.append(filtered)
        return out


class TakeFirst(Filter):
    """filters/selection.py: keep only the first response per doc."""

    def apply(self, resps, docs):
        return [inst[0] if inst else "" for inst in resps]


class FilterEnsemble:
    """Named filter pipeline (api/filter.py FilterEnsemble)."""

    def __init__(self, name: str, filters: Sequence[Filter]):
        self.name = name
        self.filters = list(filters)

    def apply(self, resps: list[list[str]], docs: list[dict]):
        for f in self.filters:
            resps = f.apply(resps, docs)
        return resps


# ---------------------------------------------------------------------------
# MMMU (tasks/mmmu/utils.py)
# ---------------------------------------------------------------------------


def mmmu_parse_options(options: Sequence[str]) -> str:
    """Options -> "A. ...\nB. ..." block (utils.py:128-131)."""
    return "\n".join(
        f"{chr(ord('A') + i)}. {opt}" for i, opt in enumerate(options)
    )


def get_multi_choice_info(options: Sequence[str]):
    """options -> (index2ans, all_choices) (utils.py:587-601)."""
    index2ans = {chr(ord("A") + i): opt for i, opt in enumerate(options)}
    return index2ans, list(index2ans)


def parse_multi_choice_response(
    response: str,
    all_choices: Sequence[str],
    index2ans: dict,
    rng_seed: Optional[int] = None,
) -> str:
    """The MMMU candidate-extraction cascade (utils.py:391-449):
    "(A)" forms first, then "A " with surrounding spaces, then "A.", then —
    for long answers — option-content containment; ties broken by the LAST
    occurrence in the response.  No-match falls back to a deterministic
    seeded draw (reference: random.choice)."""
    for ch in [",", ".", "!", "?", ";", ":", "'"]:
        response = response.strip(ch)
    response = f" {response} "

    index_ans = True
    ans_with_brack = False
    candidates: list[str] = []
    for choice in all_choices:
        if f"({choice})" in response:
            candidates.append(choice)
            ans_with_brack = True
    if not candidates:
        for choice in all_choices:
            if f"{choice} " in response:
                candidates.append(choice)
    if not candidates:
        for choice in all_choices:
            if f"{choice}." in response:
                candidates.append(choice)
    if not candidates and len(response.split()) > 5:
        for index, ans in index2ans.items():
            if str(ans).lower() in response.lower():
                candidates.append(index)
                index_ans = False
    if not candidates:
        import random
        import zlib

        # stable seed (builtin hash() is salted per process, which would
        # make re-runs disagree; the reference uses bare random.choice)
        r = random.Random(rng_seed if rng_seed is not None
                          else zlib.crc32(response.encode()))
        return r.choice(list(all_choices))
    if len(candidates) == 1:
        return candidates[0]
    starts = []
    for can in candidates:
        if not index_ans:
            starts.append(response.lower().rfind(str(index2ans[can]).lower()))
        elif ans_with_brack:
            starts.append(response.rfind(f"({can})"))
        else:
            starts.append(response.rfind(f" {can} "))
    return candidates[max(range(len(starts)), key=starts.__getitem__)]


_NUM_COMMAS = re.compile(r"-?\b\d{1,3}(?:,\d{3})+\b")
_NUM_SCI = re.compile(r"-?\d+(?:\.\d+)?[eE][+-]?\d+")
_NUM_SIMPLE = re.compile(r"-?(?:\d+\.\d+|\.\d+|\d+\b)(?![eE][+-]?\d+)(?![,\d])")


def extract_numbers(s: str) -> list[str]:
    """All number forms: comma-grouped, scientific, plain
    (utils.py:452-473)."""
    return _NUM_COMMAS.findall(s) + _NUM_SCI.findall(s) + _NUM_SIMPLE.findall(s)


def _is_number(s: str) -> bool:
    try:
        float(s.replace(",", ""))
        return True
    except ValueError:
        return False


def normalize_str(s: str):
    """Lowercase strings / round numbers to 2 decimals; 1-char strings get
    space-guards against trivial containment (utils.py:489-512)."""
    s = s.strip()
    if _is_number(s):
        return [round(float(s.replace(",", "")), 2)]
    s = s.lower()
    if len(s) == 1:
        return [f" {s}", f"{s} "]
    return [s]


_KEY_INDICATORS = ["could be ", "so ", "is ", "thus ", "therefore ",
                   "final ", "answer ", "result "]


def parse_open_response(response: str) -> list:
    """Open-ended answer extraction (utils.py:515-584): split into
    sentences, keep the shortest tail after an answer-indicator phrase,
    harvest numbers, normalize, dedupe."""
    def key_subresponses(resp: str) -> list[str]:
        resp = resp.strip().strip(".").lower()
        subs = re.split(r"\.\s(?=[A-Z])|\n", resp)
        keys = []
        for i, sub in enumerate(subs):
            indicators = list(_KEY_INDICATORS)
            if i == len(subs) - 1:
                indicators.append("=")
            shortest = None
            for ind in indicators:
                if ind in sub:
                    tail = sub.split(ind)[-1].strip()
                    if shortest is None or len(tail) < len(shortest):
                        shortest = tail
            if shortest and shortest.strip() not in [":", ",", ".", "!",
                                                     "?", ";", "'"]:
                keys.append(shortest)
        return keys or [resp]

    preds = key_subresponses(response)
    preds = preds + [n for p in preds for n in extract_numbers(p)]
    out = []
    for p in preds:
        out.extend(normalize_str(p) if isinstance(p, str) else [p])
    return list(set(out))


def eval_open(gold, pred_list: list) -> bool:
    """Open-question match (utils.py:332-358): normalized gold answers
    contained in any normalized prediction (strings) or equal (numbers)."""
    norm_answers = []
    for ans in (gold if isinstance(gold, list) else [gold]):
        norm_answers.extend(normalize_str(str(ans)))
    for pred in pred_list:
        if isinstance(pred, str):
            if any(isinstance(a, str) and a in pred for a in norm_answers):
                return True
        else:
            if any(not isinstance(a, str) and a == pred
                   for a in norm_answers):
                return True
    return False


# ---------------------------------------------------------------------------
# MME (tasks/mme/utils.py)
# ---------------------------------------------------------------------------


def mme_parse_pred_ans(pred: str) -> str:
    """yes / no / other, Otter-eval semantics (mme/utils.py:52-73):
    exact match, then y/n single chars, then containment in the first four
    characters."""
    p = pred.lower().strip().replace(".", "")
    if p in ("yes", "no"):
        return p
    if len(p) == 1:
        return {"y": "yes", "n": "no"}.get(p, "other")
    head = p[:4]
    if "yes" in head:
        return "yes"
    if "no" in head:
        return "no"
    return "other"


def mme_aggregate(rows: Sequence[dict]) -> dict:
    """Per-category acc + acc+ (both questions of an image right), x100,
    summed (mme/utils.py:97-126).  rows: {"category", "question_id",
    "score" in {0.0, 1.0}} — two rows per image."""
    by_cat: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for r in rows:
        by_cat[r["category"]][str(r["question_id"])].append(float(r["score"]))
    out = {}
    for cat, questions in by_cat.items():
        total = 0.0
        for scores in questions.values():
            acc = sum(scores) / len(scores) * 100.0
            acc_plus = float(len(scores) >= 2 and sum(scores) == len(scores)) * 100.0
            total += acc + acc_plus
        out[cat] = total / max(len(questions), 1)
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


# ---------------------------------------------------------------------------
# MathVista-style rule-based extraction (reference tasks/mathvista/
# mathvista_evals.py quick_extract + normalize_extracted_answer — the
# reference's primary extractor is a GPT call; these regexes mirror its
# documented quick path and the normalizer exactly)
# ---------------------------------------------------------------------------

_FINAL_ANSWER_PATTERNS = [
    # quoted answers first ('The answer is "X"' — the quick_extract form),
    # then a short unquoted token after the answer phrase
    re.compile(r"[Tt]he answer is\s*\"([^\"\n]+)\""),
    re.compile(r"[Tt]he answer is[:\s]*([A-Za-z0-9$.,%/()-]+)"),
    re.compile(r"[Ff]inal answer[:\s]*\"?([A-Za-z0-9$.,%/()-]+)\"?"),
    re.compile(r"[Aa]nswer[:\s]+\"?([A-Za-z0-9$.,%/()-]+)\"?"),
]


def extract_final_answer(response: str) -> str:
    """Pull the stated final answer out of a chain-of-thought response;
    fall back to the last number, then the last line."""
    response = response.strip()
    for pat in _FINAL_ANSWER_PATTERNS:
        m = pat.search(response)
        if m:
            return m.group(1).strip().rstrip(".,;:")
    nums = extract_numbers(response)
    if nums:
        return nums[-1]
    lines = [ln for ln in response.splitlines() if ln.strip()]
    return lines[-1].strip() if lines else ""


def normalize_math_answer(extraction: str, choices=None, *,
                          question_type: str = "free_form",
                          answer_type: str = "text",
                          precision=None) -> str:
    """mathvista_evals.py normalize_extracted_answer: map multi-choice
    extractions onto the option text; round numerics to the problem's
    precision; pass text through."""
    extraction = str(extraction).strip()
    if question_type == "multi_choice" and choices:
        letters = [chr(ord("A") + i) for i in range(len(choices))]
        up = extraction.upper().strip().rstrip(".)")
        if up in letters:
            return str(choices[letters.index(up)])
        for c in choices:
            if str(c).lower() == extraction.lower():
                return str(c)
        return extraction
    if answer_type in ("integer", "float") or _is_number(extraction):
        try:
            v = float(extraction.replace(",", "").replace("$", ""))
        except ValueError:
            return extraction
        if answer_type == "integer" or (precision in (None, 0)):
            return str(int(round(v))) if v == int(v) or \
                answer_type == "integer" else str(round(v, 2))
        return str(round(v, int(precision)))
    return extraction


def normalize_number(s: str) -> str:
    """gsm8k strict-match canonicalization: the reference scores with
    exact_match under regexes_to_ignore [',', '\\$', '(?s).*#### ',
    '\\.$'] and ignore_case (gsm8k-cot-llama.yaml:69-79).  Pure string
    transforms — no float round-trip — so '42.0' does NOT match gold
    '42', exactly as upstream."""
    s = str(s)
    for pat in (",", r"\$", r"(?s).*#### ", r"\.$"):
        s = re.sub(pat, "", s)
    return s.strip().lower()
