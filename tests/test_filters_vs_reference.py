"""Answer-extraction parity vs the ACTUAL reference implementation.

Imports /root/reference/eval/lmms_eval/tasks/mmmu/utils.py (the canonical
multi-choice / open-response extraction cascade the published MMMU-style
numbers flow through) with its service deps stubbed, and cross-checks our
filters on a corpus of synthetic model responses.  The no-candidate
fallback is excluded: the reference draws with the GLOBAL random
(utils.py parse_multi_choice_response), ours with a stable seeded Random
— both are arbitrary by design there."""

import importlib.util
import sys
import types

import pytest

from lavida_mod_tpu.eval import filters as F


@pytest.fixture(scope="module")
def ref_utils():
    class _Client:
        def __init__(self, *a, **k):
            pass

    openai = types.ModuleType("openai")
    openai.AzureOpenAI = _Client
    openai.OpenAI = _Client
    loguru = types.ModuleType("loguru")
    loguru.logger = types.SimpleNamespace(
        info=lambda *a, **k: None, warning=lambda *a, **k: None,
        error=lambda *a, **k: None, debug=lambda *a, **k: None)
    lmms = types.ModuleType("lmms_eval")
    tasks_m = types.ModuleType("lmms_eval.tasks")
    tu = types.ModuleType("lmms_eval.tasks._task_utils")
    fu = types.ModuleType("lmms_eval.tasks._task_utils.file_utils")
    fu.generate_submission_file = lambda *a, **k: "/tmp/sub.json"
    mods = {"openai": openai, "loguru": loguru, "lmms_eval": lmms,
            "lmms_eval.tasks": tasks_m,
            "lmms_eval.tasks._task_utils": tu,
            "lmms_eval.tasks._task_utils.file_utils": fu}
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_mmmu_utils",
            "/root/reference/eval/lmms_eval/tasks/mmmu/utils.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        yield m
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


CHOICES = ["a red car", "two dogs", "the Eiffel Tower", "7.5 meters"]
RESPONSES_MC = [
    "The answer is (B).",
    "(A)",
    "B.",
    "I would go with C because of the landmark in the background.",
    "After careful consideration, the correct option is D.",
    "A. a red car",
    "It clearly shows the Eiffel Tower in the distance of the scene.",
    "Definitely two dogs are visible playing in the large park area.",
    "The measurement is 7.5 meters long according to the given scale bar.",
    "Answer: C",
    # NOTE "C) the Eiffel Tower" is excluded: the cascade has no "X)"
    # pattern (only "(X)", "X ", "X."), so BOTH implementations fall to
    # the random draw there — a shared blindspot, not a divergence
    "first A then changed my mind: B .",
    "(D) 7.5 meters",
]

RESPONSES_OPEN = [
    "The total is 42.",
    "So the final answer is 3.14159 after rounding.",
    "There are seven apples, thus 7.",
    "The answer is blue.",
    "It costs $1,234 in total.",
    "Therefore x = -5.",
    "2e-3 is the result.",
    "The building is 100 meters tall, so 100.",
]


def test_multi_choice_cascade_matches_reference(ref_utils):
    index2ans, all_choices = F.get_multi_choice_info(CHOICES)
    # same info construction as reference get_multi_choice_info
    r_index2ans, r_all_choices = ref_utils.get_multi_choice_info(CHOICES)
    assert all_choices == r_all_choices
    assert index2ans == r_index2ans

    for resp in RESPONSES_MC:
        ours = F.parse_multi_choice_response(
            resp, list(all_choices), dict(index2ans))
        theirs = ref_utils.parse_multi_choice_response(
            resp, list(r_all_choices), dict(r_index2ans))
        assert ours == theirs, (resp, ours, theirs)


def test_open_response_matches_reference(ref_utils):
    for resp in RESPONSES_OPEN:
        ours = F.parse_open_response(resp)
        theirs = ref_utils.parse_open_response(resp)
        assert ours == theirs, (resp, ours, theirs)


def test_eval_open_matches_reference(ref_utils):
    cases = [
        ("42", ["the total is 42"]),
        ("blue", ["the answer is blue"]),
        (["7.5 meters", "7.5m"], ["it is 7.5 meters"]),
        ("100", ["about 99"]),
    ]
    for gold, resps in cases:
        for resp in resps:
            ours = F.eval_open(gold, F.parse_open_response(resp))
            theirs = ref_utils.eval_open(
                gold, ref_utils.parse_open_response(resp))
            assert ours == theirs, (gold, resp, ours, theirs)
