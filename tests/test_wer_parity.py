"""A/B fuzz of the WER text pipeline against the reference oracle.

The reference module (`/root/reference/tools/wer/calculate_wer.py`) is pure
Python for `characterize`/`stripoff_tags`/`normalize`/`Calculator`, but its
module scope imports torch/transformers/tqdm/soundfile — so the A/B runs in a
subprocess with those stubbed (keeps this test fast and the pytest process's
real torch untouched).

Pins: token streams equal on 1,200 fuzzed mixed EN/CJK/tagged/punctuated
strings, and Calculator alignment stats (cor/sub/del/ins + WER) equal on 300
fuzzed token-list pairs including the quirky tie-break attribution.
"""

import json
import subprocess
import sys

import pytest

from conftest import HAS_REFERENCE, REPO_ROOT

_AB_SCRIPT = r"""
import json, random, sys, types
import importlib.util

# stub the reference module's heavy/absent imports (we only exercise its pure
# text functions)
for name in ("torch", "tqdm", "soundfile"):
    if name not in sys.modules:
        m = types.ModuleType(name)
        if name == "tqdm":
            m.tqdm = lambda x, **k: x
        sys.modules[name] = m
tr = types.ModuleType("transformers")
tr.HubertForCTC = object
tr.Wav2Vec2Processor = object
sys.modules.setdefault("transformers", tr)

spec = importlib.util.spec_from_file_location(
    "ref_wer", "/root/reference/tools/wer/calculate_wer.py")
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

sys.path.insert(0, sys.argv[1])
from simwhisper_codec_tpu.eval import wer as jwer

rng = random.Random(20260817)
ATOMS = [
    "hello", "WORLD", "don't", "x1y2", "abc-def", "MiXeD", "a", "I'm",
    "you", "are", "the", "quick", "brown", "fox", "", "co2",
]
CJK = "你好世界语音编解码器测试中文字符"
PUNCT = "!,?、。！，；？：「」︰『』《》"
TAGS = ["<noise>", "<unk>", "<s>", "</s>", "<spoken_noise>", "<", ">", "<incomplete"]
EXTRAS = [" ", "  ", "\t", "\n", "\r", "é", "ü", "ß", "→", "½", "№", "…", "–",
          "3.14", "100%", "$5", "a<b", "x>y", "<a b>", "e<t>f", "tag<x>mid<y>end"]

def fuzz_string():
    parts = []
    for _ in range(rng.randint(0, 14)):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(ATOMS))
        elif r < 0.5:
            parts.append("".join(rng.choice(CJK) for _ in range(rng.randint(1, 4))))
        elif r < 0.62:
            parts.append(rng.choice(TAGS))
        elif r < 0.75:
            parts.append(rng.choice(EXTRAS))
        elif r < 0.88:
            w = rng.choice(ATOMS)
            p = rng.choice(PUNCT)
            parts.append(rng.choice([w + p, p + w, w + p + w]))
        else:
            parts.append(chr(rng.randint(0x20, 0x2FFF)))
    sep = rng.choice([" ", "", " ", " ", "\t"])
    return sep.join(parts)

tok_mismatches = []
for i in range(1200):
    s = fuzz_string()
    want = ref.normalize(ref.characterize(s), [], False, None)
    got = jwer.normalize_text(s)
    if want != got:
        tok_mismatches.append({"s": s, "want": want, "got": got})
        if len(tok_mismatches) >= 5:
            break

calc_mismatches = []
VOCAB = ["A", "B", "C", "AB", "XY", "你", "好", "THE", "CAT"]
for i in range(300):
    lab = [rng.choice(VOCAB) for _ in range(rng.randint(0, 12))]
    rec = [rng.choice(VOCAB) for _ in range(rng.randint(0, 12))]
    r = ref.Calculator().calculate(list(lab), list(rec))
    s = jwer.edit_distance(lab, rec)
    ref_stats = (r["cor"], r["sub"], r["del"], r["ins"])
    got_stats = (s.cor, s.sub, s.dele, s.ins)
    ref_all = r["all"]
    if ref_stats != got_stats or ref_all != s.ref_words:
        calc_mismatches.append(
            {"lab": lab, "rec": rec, "ref": ref_stats + (ref_all,),
             "got": got_stats + (s.ref_words,)})
        if len(calc_mismatches) >= 5:
            break

print(json.dumps({"tok_mismatches": tok_mismatches,
                  "calc_mismatches": calc_mismatches}))
"""


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference oracle not mounted")
def test_wer_pipeline_matches_reference_oracle():
    out = subprocess.run(
        [sys.executable, "-c", _AB_SCRIPT, str(REPO_ROOT)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["tok_mismatches"] == [], res["tok_mismatches"][:2]
    assert res["calc_mismatches"] == [], res["calc_mismatches"][:2]


def test_characterize_reference_quirks():
    """The documented quirky semantics the fuzz pins, as readable examples."""
    from simwhisper_codec_tpu.eval.wer import (
        characterize, normalize, normalize_text, stripoff_tags,
    )

    # trailing punctuation stays attached; leading list-puncts are skipped
    assert characterize("hello, world") == ["hello,", "world"]
    assert characterize(",hello") == ["hello"]
    # Lo chars one-per-token; tags grouped through '>'
    assert characterize("你好 <noise> ok") == ["你", "好", "<noise>", "ok"]
    # '<' mid-token does NOT split; normalize strips the tag span
    assert characterize("abc<t>def") == ["abc<t>def"]
    assert normalize_text("abc<t>def") == ["ABCDEF"]
    # unclosed tag drops the tail
    assert stripoff_tags("<incomplete") == ""
    assert normalize(["<s>", "x"], (), False) == ["X"]


def test_wer_calculator():
    """Former test_eval_and_utils case, updated to reference-faithful semantics."""
    from simwhisper_codec_tpu.eval.wer import Calculator, edit_distance, normalize_text

    assert normalize_text("Hello, world! <noise> 你好") == \
        ["HELLO,", "WORLD!", "你", "好"]
    s = edit_distance(["A", "B", "C"], ["A", "X", "C", "D"])
    assert (s.cor, s.sub, s.ins, s.dele) == (2, 1, 1, 0)
    calc = Calculator()
    calc.calculate("u1", "the cat sat", "the cat sat")
    calc.calculate("u2", "the dog ran", "a dog")
    assert calc.total.cor == 4 and abs(calc.wer - 2 / 6) < 1e-9
