"""Zero-shot harness tests: offline synthetic docs through the full
evaluator stack with a tiny model (SURVEY.md §4g)."""
import numpy as np
import jax
import pytest

from quip_tpu.eval.zeroshot import (TASK_REGISTRY, evaluate, get_task_dict,
                                    make_table, simple_evaluate)
from quip_tpu.eval.zeroshot.lm import (ByteTokenizer, JaxLM,
                                       get_rolling_token_windows,
                                       make_disjoint_window)
from quip_tpu.eval.zeroshot import metrics
from quip_tpu.models import get_config
from quip_tpu.models import model as M


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    return JaxLM(params, cfg, ByteTokenizer(cfg.vocab_size), batch_size=4,
                 max_length=128)


def _piqa_docs(n=6):
    return {"train": [
        {"goal": f"do thing {i}", "sol1": f"answer A {i}",
         "sol2": f"answer B {i}", "label": i % 2} for i in range(n)
    ], "validation": [
        {"goal": f"do val {i}", "sol1": f"val A {i}",
         "sol2": f"val B {i}", "label": i % 2} for i in range(n)
    ]}


def test_registry_complete():
    # the reference registry has exactly these 13 tasks
    # (zeroShot/tasks/__init__.py:17-31)
    want = {"lambada", "piqa", "arc_easy", "arc_challenge", "boolq", "cb",
            "copa", "wic", "multirc", "rte", "record", "wsc", "storycloze"}
    assert want <= set(TASK_REGISTRY)
    # plus our offline smoke task and the GLUE extras the reference
    # defines but never registers (glue.py:56-494; STSB is a
    # NotImplementedError stub there and is deliberately omitted)
    assert set(TASK_REGISTRY) - want == {
        "synthetic", "cola", "sst", "mnli", "mnli_mismatched", "qnli",
        "wnli", "mrpc", "qqp"}


def test_all_tasks_synthetic_docs(tiny_lm):
    """EVERY registered task runs its real prompt/request/metric pipeline
    over schema-faithful synthetic docs (the accept-day offline drill,
    cli/accept.py --synthetic_docs)."""
    from quip_tpu.eval.zeroshot.synthetic_docs import synthetic_datasets

    names = sorted(TASK_REGISTRY)
    tasks = get_task_dict(names, datasets=synthetic_datasets(names, n=4))
    out = simple_evaluate(tiny_lm, tasks, limit=4, bootstrap_iters=4)
    assert set(out["results"]) == set(names)
    for name, res in out["results"].items():
        scalars = [v for v in res.values()
                   if isinstance(v, (int, float))]
        assert scalars, (name, res)
        assert all(np.isfinite(v) for v in scalars), (name, res)


def test_glue_extras_end_to_end(tiny_lm):
    """Every ported GLUE extra runs offline through the evaluator with
    pre-built docs, producing its reference metrics."""
    docs = {
        "cola": {"validation": [
            {"sentence": "The cat sat.", "label": 1},
            {"sentence": "Cat the on sat mat the.", "label": 0}]},
        "sst": {"validation": [
            {"sentence": "a delightful film", "label": 1},
            {"sentence": "a dreadful mess", "label": 0}]},
        "mnli": {"validation_matched": [
            {"premise": "A man is eating.", "hypothesis": "A person eats",
             "label": 0},
            {"premise": "A man sleeps.", "hypothesis": "A man runs.",
             "label": 2}]},
        "mnli_mismatched": {"validation_mismatched": [
            {"premise": "Dogs bark.", "hypothesis": "Animals make noise.",
             "label": 0}]},
        "qnli": {"validation": [
            {"question": "What color is the sky?",
             "sentence": "The sky is blue.", "label": 0}]},
        "wnli": {"validation": [
            {"sentence1": "The cup fell.", "sentence2": "It broke.",
             "label": 1}]},
        "mrpc": {"validation": [
            {"sentence1": "He ate.", "sentence2": "He had a meal.",
             "label": 1},
            {"sentence1": "He ate.", "sentence2": "She left.",
             "label": 0}]},
        "qqp": {"validation": [
            {"question1": "How do I cook rice?",
             "question2": "What is the way to cook rice?", "label": 1}]},
    }
    names = sorted(docs)
    tasks = get_task_dict(names, datasets=docs)
    out = simple_evaluate(tiny_lm, tasks, num_fewshot=0, limit=4,
                          bootstrap_iters=4)
    for name in names:
        res = out["results"][name]
        metric = "mcc" if name == "cola" else "acc"
        assert metric in res, (name, res)
        assert -1.0 <= res[metric] <= 1.0
    assert "f1" in out["results"]["mrpc"]
    assert "f1" in out["results"]["qqp"]


def test_piqa_end_to_end(tiny_lm):
    tasks = get_task_dict(["piqa"], datasets={"piqa": _piqa_docs()})
    out = simple_evaluate(tiny_lm, tasks, num_fewshot=0, limit=4,
                          bootstrap_iters=10)
    res = out["results"]["piqa"]
    assert 0.0 <= res["acc"] <= 1.0
    assert 0.0 <= res["acc_norm"] <= 1.0
    assert "acc_stderr" in res
    table = make_table(out)
    assert "piqa" in table


def test_fewshot_context(tiny_lm):
    import random
    tasks = get_task_dict(["piqa"], datasets={"piqa": _piqa_docs()})
    task = tasks["piqa"]
    doc = list(task.validation_docs())[0]
    ctx = task.fewshot_context(doc, num_fewshot=2, rnd=random.Random(0))
    # two labeled examples + the query
    assert ctx.count("Question:") == 3
    assert ctx.count("Answer:") == 3
    assert ctx.endswith("Answer:")


def test_boolq_style_task(tiny_lm):
    docs = {"train": [], "validation": [
        {"passage": f"passage {i}", "question": f"is it {i}",
         "label": i % 2} for i in range(4)
    ]}
    tasks = get_task_dict(["boolq"], datasets={"boolq": docs})
    out = simple_evaluate(tiny_lm, tasks, limit=4, bootstrap_iters=0)
    assert 0.0 <= out["results"]["boolq"]["acc"] <= 1.0


def test_lambada_style_task(tiny_lm):
    docs = {"validation": [], "test": [
        {"text": f"some words lead to token{i}"} for i in range(4)
    ]}
    tasks = get_task_dict(["lambada"], datasets={"lambada": docs})
    out = simple_evaluate(tiny_lm, tasks, limit=4, bootstrap_iters=0)
    res = out["results"]["lambada"]
    assert res["ppl"] > 0 and 0 <= res["acc"] <= 1


def test_lambada_offline_jsonl(tiny_lm, tmp_path):
    """--data_dir path: the OpenAI lambada_test.jsonl loads with zero
    egress (reference vendored loader parity,
    zeroShot/tasks/local_datasets/lambada/lambada.py)."""
    import json

    path = tmp_path / "lambada_test.jsonl"
    with open(path, "w", encoding="utf-8") as f:
        for i in range(4):
            f.write(json.dumps({"text": f"some words lead to tok{i}"}) + "\n")
    tasks = get_task_dict(["lambada"], data_dir=str(tmp_path))
    docs = list(tasks["lambada"].validation_docs())
    assert len(docs) == 4 and docs[0]["text"].startswith("some words")
    out = simple_evaluate(tiny_lm, tasks, limit=4, bootstrap_iters=0)
    res = out["results"]["lambada"]
    assert res["ppl"] > 0 and 0 <= res["acc"] <= 1


def test_multirc_acc_all(tiny_lm):
    docs = {"train": [], "validation": [
        {"paragraph": "p", "question": f"q{i // 2}",
         "answer": f"a{i}", "label": i % 2,
         "idx": {"paragraph": 0, "question": i // 2}} for i in range(4)
    ]}
    tasks = get_task_dict(["multirc"], datasets={"multirc": docs})
    out = simple_evaluate(tiny_lm, tasks, limit=4, bootstrap_iters=0)
    assert 0.0 <= out["results"]["multirc"]["acc"] <= 1.0


def test_loglikelihood_semantics(tiny_lm):
    """Additivity: ll(ctx, a+b) == ll(ctx, a) + ll(ctx+a, b) (within fp)."""
    ctx = "hello world"
    [(ll_ab, _)] = tiny_lm.loglikelihood([(ctx, " foo bar")])
    [(ll_a, _)] = tiny_lm.loglikelihood([(ctx, " foo")])
    [(ll_b, _)] = tiny_lm.loglikelihood([(ctx + " foo", " bar")])
    np.testing.assert_allclose(ll_ab, ll_a + ll_b, rtol=1e-3, atol=1e-3)


def test_loglikelihood_ordering_stable(tiny_lm):
    """Reorderer must restore original order."""
    reqs = [("a", " x"), ("much longer context here", " yy"), ("b", " zzz")]
    out1 = tiny_lm.loglikelihood(reqs)
    out2 = [tiny_lm.loglikelihood([r])[0] for r in reqs]
    for (a, ga), (b, gb) in zip(out1, out2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
        assert ga == gb


def test_rolling_windows():
    """Port of the reference rolling-window semantics
    (models_utils.py:480-520)."""
    toks = list(range(10))
    wins = list(get_rolling_token_windows(toks, prefix_token=-1,
                                          max_seq_len=4, context_len=1))
    # all tokens predicted exactly once
    predicted = [t for _, pred in wins for t in pred]
    assert predicted == toks
    # first window conditions on the prefix token
    assert wins[0][0][0] == -1
    disjoint = [make_disjoint_window(w) for w in wins]
    for inp, pred in disjoint:
        assert len(inp) + len(pred) - 1 <= 4 + 1


def test_loglikelihood_rolling_matches_sum(tiny_lm):
    s = "abcdefgh" * 4
    [total] = tiny_lm.loglikelihood_rolling([(s,)])
    assert np.isfinite(total) and total < 0


def test_metrics():
    assert metrics.mean([1, 2, 3]) == 2
    assert abs(metrics.perplexity([-1.0, -1.0]) - np.e) < 1e-9
    assert metrics.f1_score([(1, 1), (1, 1), (0, 0)]) == 1.0
    assert metrics.matthews_corrcoef([(1, 1), (0, 0), (1, 1), (0, 0)]) == 1.0
    assert metrics.squad_em("The Cat", "cat") == 1.0
    assert 0 < metrics.squad_f1("a b c", "a b d") < 1
    se = metrics.bootstrap_stderr(metrics.mean, [1.0, 2.0, 3.0, 4.0],
                                  iters=50)
    assert 0 < se < 2


def test_greedy_until(tiny_lm):
    outs = tiny_lm.greedy_until([("ab", ["\n"])], max_gen_toks=4)
    assert len(outs) == 1 and isinstance(outs[0], str)


def test_greedy_until_kv_quant():
    """kv_quant=True routes int8 caches into the generation engine
    (the --kv_quant quality-gate path, docs/ACCEPT.md §2b)."""
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    lm = JaxLM(params, cfg, ByteTokenizer(cfg.vocab_size), batch_size=4,
               max_length=128, kv_quant=True)
    outs = lm.greedy_until([("ab", ["\n"])], max_gen_toks=4)
    assert len(outs) == 1 and isinstance(outs[0], str)
    assert lm._gen_engine_cached.pkv.quantized


def test_greedy_until_shared_engine(tiny_lm):
    """Batched requests run through ONE cached engine (VERDICT r2 weak #6)
    and match per-request generation (greedy is batch-invariant)."""
    prompts = [("ab", ["\n"]), ("ba c", ["\n"]), ("c", ["\n"])]
    singles = [tiny_lm.greedy_until([p], max_gen_toks=4)[0]
               for p in prompts]
    batched = tiny_lm.greedy_until(list(prompts), max_gen_toks=4)
    assert batched == singles
    # ONE cached engine, reused across all calls above; a smaller-bucket
    # request reuses it and a larger bucket REPLACES it rather than
    # accumulating per-bucket engines (ADVICE r3: device KV allocations
    # piled up across a mixed-length task list)
    eng = tiny_lm._gen_engine_cached
    assert tiny_lm._gen_engine(eng.max_seq // 2) is eng
    bigger = tiny_lm._gen_engine(eng.max_seq * 2)
    assert bigger is not eng
    assert tiny_lm._gen_engine_cached is bigger


def test_synthetic_task_cli_offline(tiny_lm, capsys):
    """The zeroshot CLI runs fully offline via the synthetic task."""
    tasks = get_task_dict(["synthetic"])
    out = simple_evaluate(tiny_lm, tasks, num_fewshot=0, limit=6,
                          bootstrap_iters=10)
    res = out["results"]["synthetic"]
    assert 0.0 <= res["acc"] <= 1.0
