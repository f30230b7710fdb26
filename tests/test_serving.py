"""Sealed serving bundles (cliora_tpu/serving.py + scripts/export_model).

The exported artifact must reproduce the live model's parses exactly:
trees from the padded, length-masked, symbolic-batch StableHLO artifact
are compared against Trainer.parse on the exact-length batch.
"""

import os

import jax
import numpy as np

from cliora_tpu.analysis.trees import bp_to_tree
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_params
from cliora_tpu.serving import ExportedParser, export_parser, save_bundle
from cliora_tpu.training.trainer import TrainConfig, Trainer

V = 50


def _params(cfg, seed=0):
    from oracle import perturb_params

    # perturb so split scores are non-trivial (zero-init image encoder)
    return perturb_params(init_params(jax.random.PRNGKey(seed), cfg, V))


def test_text_bundle_matches_live_parse(rng, tmp_path):
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [5, 9]),
                word2idx={"w%d" % i: i for i in range(V)})
    served = ExportedParser(bundle)
    assert served.word2idx is not None

    # ragged lengths straddling both buckets, order-scrambled
    sents = [list(rng.randint(2, V, n)) for n in (3, 9, 5, 7, 4)]
    got = served.parse(sents)

    trainer = Trainer(cfg, TrainConfig(k_neg=5), params)
    for sent, tree in zip(sents, got):
        res, _ = trainer.parse(
            {"sentences": np.asarray([sent], np.int32)}, impl="xla")
        want = bp_to_tree(len(sent), res["cky_bp"][0])
        assert tree == want, (sent, tree, want)


def test_symbolic_batch_any_size(rng, tmp_path):
    """One artifact serves B=1 and B=7 alike (symbolic batch dim)."""
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]))
    served = ExportedParser(bundle)
    one = served.parse([list(rng.randint(2, V, 6))])
    many = served.parse([list(rng.randint(2, V, 6)) for _ in range(7)])
    assert len(one) == 1 and len(many) == 7


def test_cliora_bundle_grounding(rng, tmp_path):
    cfg = ModelConfig(size=16, input_size=24, use_obj=True, n_regions=3,
                      obj_feat_size=8)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]))
    served = ExportedParser(bundle)

    sents = [list(rng.randint(2, V, 6)), list(rng.randint(2, V, 4))]
    feats = rng.randn(2, 3, 8).astype(np.float32)
    trees, attn = served.parse(sents, obj_feats=feats)

    trainer = Trainer(cfg, TrainConfig(k_neg=5, attn_impl="chunked"),
                      params)
    for i, sent in enumerate(sents):
        res, _ = trainer.parse({
            "sentences": np.asarray([sent], np.int32),
            "obj_feats": feats[i:i + 1]})
        want_tree = bp_to_tree(len(sent), res["cky_bp"][0])
        assert trees[i] == want_tree
        want_attn = np.asarray(res["atten_score"])[0].argmax(-1)
        np.testing.assert_array_equal(attn[i], want_attn)


def test_length_over_largest_bucket_raises(rng, tmp_path):
    cfg = ModelConfig(size=16, input_size=24)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, _params(cfg), [5]))
    served = ExportedParser(bundle)
    try:
        served.parse([list(rng.randint(2, V, 9))])
    except ValueError as e:
        assert "exceeds" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_export_model_cli(tmp_path):
    from cliora_tpu.scripts import export_model

    root = str(tmp_path / "corpus")
    os.makedirs(root)
    rs = np.random.RandomState(0)
    words = [f"w{i}" for i in range(30)]
    with open(os.path.join(root, "val.txt"), "w") as f:
        for _ in range(8):
            f.write(" ".join(words[rs.randint(0, 30)]
                             for _ in range(5)) + "\n")

    exp = str(tmp_path / "exp")
    bundle = export_model.main([
        "--data_type", "txt", "--emb", "none",
        "--train_path", os.path.join(root, "val.txt"),
        "--validation_path", os.path.join(root, "val.txt"),
        "--experiment_path", exp,
        "--hidden_dim", "16", "--export_lengths", "5,8"])
    served = ExportedParser(bundle)
    assert served.bucket_lengths == [5, 8]
    # vocab carries only corpus words; any three ids make a sentence
    ids = sorted(served.word2idx.values())[:3]
    trees = served.parse([ids])
    assert len(trees) == 1


def test_parse_text_word_leaves(rng, tmp_path):
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    w2i = {"<unk>": 1, "the": 2, "dog": 3, "runs": 4, "fast": 5}
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]), word2idx=w2i)
    served = ExportedParser(bundle)
    trees = served.parse_text(["the dog runs very fast"])  # 'very' -> unk
    leaves = []

    def walk(t):
        if isinstance(t, tuple):
            for x in t:
                walk(x)
        else:
            leaves.append(t)

    walk(trees[0])
    assert leaves == ["the", "dog", "runs", "very", "fast"]
    # same split structure as parsing the ids directly
    ids = [w2i.get(w, 1) for w in "the dog runs very fast".split()]
    want = served.parse([ids])[0]
    from cliora_tpu.analysis.trees import replace_leaves
    assert trees[0] == replace_leaves(want, "the dog runs very fast".split())


def test_pinned_batch_bundle(rng, tmp_path):
    """--export_batch bundles record the pinned B; the loader chunks and
    pads requests to exactly that size and discards pad outputs."""
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    pinned = str(tmp_path / "pinned")
    save_bundle(pinned, cfg, export_parser(cfg, params, [6], batch=4),
                batch=4)
    served = ExportedParser(pinned)
    assert served.meta["batch"] == 4

    sents = [list(rng.randint(2, V, n)) for n in (3, 6, 4, 5, 6, 2)]
    got = served.parse(sents)  # 6 requests -> chunks of 4 + padded 2

    sym = str(tmp_path / "sym")
    save_bundle(sym, cfg, export_parser(cfg, params, [6]))
    want = ExportedParser(sym).parse(sents)
    assert got == want


def test_symbolic_batch_shape_quantization(rng, tmp_path):
    """Symbolic-batch artifacts only ever see power-of-two batch sizes.

    Each DISTINCT concrete batch size re-specializes (recompiles) the
    exported artifact -- seconds per size over a remote compile path --
    so the loader quantizes padded rows to the next power of two
    (measured on TPU: variable-size micro-batched serving was 4.7x
    SLOWER than serialized dispatch before quantization, bench_serving
    2026-08-18).  Pad rows are discarded, so parses are unchanged."""
    from cliora_tpu.serving import _pow2_rows

    assert [_pow2_rows(n) for n in (1, 2, 3, 4, 5, 7, 8, 9)] == \
        [1, 2, 4, 4, 8, 8, 8, 16]

    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]))
    served = ExportedParser(bundle)

    seen = []

    class Spy:
        def __init__(self, inner):
            self.inner = inner

        def call(self, *args):
            seen.append(args[0].shape[0])
            return self.inner.call(*args)

    served._fns[6] = Spy(served._fns[6])
    sents = [list(rng.randint(2, V, n)) for n in (3, 6, 4, 5, 6)]
    got = served.parse(sents)
    assert seen == [8], seen  # 5 requests -> one padded-to-8 call

    per_one = [served.parse([s])[0] for s in sents]
    assert got == per_one
    assert set(seen[1:]) == {1}  # B=1 quantizes to 1, not 2


def test_warmup_covers_every_quantized_shape(rng, tmp_path):
    """ExportedParser.warmup pre-specializes each (bucket, pow2-batch)
    shape so no live request pays a first-hit compile (measured on the
    TPU tunnel: un-warmed micro-batched serving ran 1.9 req/s vs 36.3
    lock-serialized at concurrency 16 -- each novel size stalls tens of
    seconds on the remote compile, bench_serving 2026-08-19)."""
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [4, 6]))
    served = ExportedParser(bundle)

    seen = {4: [], 6: []}

    class Spy:
        def __init__(self, inner, log):
            self.inner, self.log = inner, log

        def call(self, *args):
            self.log.append(args[0].shape[0])
            return self.inner.call(*args)

    for L in (4, 6):
        served._fns[L] = Spy(served._fns[L], seen[L])

    n = served.warmup(max_batch=5)  # pow2 cap -> sizes 1, 2, 4, 8
    assert n == 8
    assert seen[4] == [1, 2, 4, 8] and seen[6] == [1, 2, 4, 8]

    # every size a parse can now produce (<= 8 rows) was pre-seen
    sents = [list(rng.randint(2, V, 6)) for _ in range(5)]
    assert len(served.parse(sents)) == 5
    assert seen[6][-1] in seen[6][:4]


def test_warmup_pinned_batch(rng, tmp_path):
    """Pinned-batch bundles have exactly one shape per bucket."""
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [5], batch=4),
                batch=4)
    served = ExportedParser(bundle)
    assert served.warmup(max_batch=64) == 1


def test_http_server_roundtrip(rng, tmp_path):
    """scripts/serve.py: POST /parse over a live (threaded) server
    returns the same trees as the in-process loader."""
    import http.client
    import json as _json
    import threading

    from cliora_tpu.scripts.serve import make_server

    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    w2i = {"<unk>": 1, "a": 2, "b": 3, "c": 4}
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]), word2idx=w2i)

    # warm=False: warmup coverage is tested directly (test_warmup_*);
    # here it would only add per-shape compiles on the 1-core test host
    # cache=False: the executable cache sets process-global jax config
    srv = make_server(bundle, port=0, warm=False, cache=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

        conn.request("GET", "/healthz")
        health = _json.loads(conn.getresponse().read())
        assert health["ok"] and health["meta"]["bucket_lengths"] == [6]

        sents = [list(map(int, rng.randint(2, V, n))) for n in (4, 6)]
        body = _json.dumps({"sentences": sents})
        conn.request("POST", "/parse", body,
                     {"Content-Type": "application/json"})
        got = _json.loads(conn.getresponse().read())["trees"]

        def tupleize(t):
            return tuple(tupleize(x) for x in t) if isinstance(t, list) \
                else t

        want = ExportedParser(bundle).parse(sents)
        assert [tupleize(t) for t in got] == want

        conn.request("POST", "/parse",
                     _json.dumps({"texts": ["a b c"]}),
                     {"Content-Type": "application/json"})
        trees = _json.loads(conn.getresponse().read())["trees"]
        assert trees == [[["a", "b"], "c"]] or trees == [["a", ["b", "c"]]]

        conn.request("POST", "/nope", "{}")
        assert conn.getresponse().status == 404
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_microbatcher_coalesces_and_scatters():
    """Concurrent submits within the window run as ONE parser call, and
    each caller gets exactly its own trees back."""
    import threading

    from cliora_tpu.serving import MicroBatcher

    calls = []

    class FakeParser:
        def parse(self, sentences, max_rows=None):
            calls.append(len(sentences))
            return [("tree", tuple(s)) for s in sentences]

    mb = MicroBatcher(FakeParser(), max_batch=16, max_wait_ms=200.0)
    results = {}

    def worker(i):
        sents = [[i, 0], [i, 1]] if i % 2 else [[i, 9]]
        results[i] = (sents, mb.submit(sents))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == 6
    for i, (sents, trees) in results.items():
        assert trees == [("tree", tuple(s)) for s in sents], i
    # 6 requests, 9 sentences total -- far fewer parser calls than
    # requests (>=1; the first may dispatch alone before the rest queue)
    assert sum(calls) == 9
    assert len(calls) <= 3, calls


def test_microbatcher_error_propagates():
    from cliora_tpu.serving import MicroBatcher

    class Boom:
        def parse(self, sentences, max_rows=None):
            raise ValueError("nope")

    mb = MicroBatcher(Boom(), max_wait_ms=0.0)
    import pytest

    with pytest.raises(ValueError, match="nope"):
        mb.submit([[1, 2]])


def test_http_server_concurrent_requests(rng, tmp_path):
    """N parallel POSTs through the micro-batched server all come back
    correct (and identical to the in-process loader)."""
    import http.client
    import json as _json
    import threading

    from cliora_tpu.scripts.serve import make_server

    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]),
                word2idx={"<unk>": 1, "a": 2, "b": 3, "c": 4})

    srv = make_server(bundle, port=0, max_wait_ms=50.0, warm=False,
                      cache=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        sents = [[list(map(int, rng.randint(2, V, n)))] for n in
                 (3, 4, 5, 6, 4, 3)]
        want = {i: ExportedParser(bundle).parse(s)
                for i, s in enumerate(sents)}
        got = {}

        def post(i):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=60)
            conn.request("POST", "/parse",
                         _json.dumps({"sentences": sents[i]}),
                         {"Content-Type": "application/json"})
            got[i] = _json.loads(conn.getresponse().read())["trees"]
            conn.close()

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(sents))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)

        def tupleize(t):
            return tuple(tupleize(x) for x in t) if isinstance(t, list) \
                else t

        assert len(got) == len(sents)
        for i in got:
            assert [tupleize(t) for t in got[i]] == want[i], i
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_microbatcher_bounds_coalesced_rows():
    """max_batch bounds SENTENCES per device call (the warmup unit), not
    requests: coalescing stops at the row budget, the overflowing
    request opens the next batch, and every caller still gets its own
    trees (ADVICE r3: request-count bounding let coalesced batches
    exceed the warmed shapes)."""
    import threading

    from cliora_tpu.serving import MicroBatcher

    calls = []

    class FakeParser:
        def parse(self, sentences, max_rows=None):
            calls.append((len(sentences), max_rows))
            return [tuple(s) for s in sentences]

    mb = MicroBatcher(FakeParser(), max_batch=4, max_wait_ms=200.0)
    results = {}

    def worker(i):
        sents = [[i, j] for j in range(3)]  # 3 rows per request
        results[i] = mb.submit(sents)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i in range(4):
        assert results[i] == [(i, j) for j in range(3)], i
    # 12 rows / 4-row budget: no call may exceed 4 rows, and the row
    # cap is forwarded so parse chunks any oversized single request
    assert sum(n for n, _ in calls) == 12
    assert all(n <= 4 for n, _ in calls), calls
    assert all(mr == 4 for _, mr in calls), calls
    mb.close()


def test_parse_max_rows_chunks_oversized_groups(rng, tmp_path):
    """ExportedParser.parse(max_rows=N) never calls an artifact with
    more than pow2(N) rows, so a warmup(N) covers every call."""
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    bundle = str(tmp_path / "bundle")
    save_bundle(bundle, cfg, export_parser(cfg, params, [6]))
    served = ExportedParser(bundle)

    seen = []

    class Spy:
        def __init__(self, inner):
            self.inner = inner

        def call(self, *args):
            seen.append(args[0].shape[0])
            return self.inner.call(*args)

    served._fns[6] = Spy(served._fns[6])
    sents = [list(map(int, rng.randint(2, V, 6))) for _ in range(11)]
    want = served.parse(sents)           # one 16-row padded call
    assert max(seen) == 16
    seen.clear()
    got = served.parse(sents, max_rows=4)  # chunked: 4+4+4 rows max
    assert max(seen) <= 4 and len(seen) == 3
    assert got == want


def test_microbatcher_isolates_bad_requests():
    """One malformed request in a coalesced batch must not fail its
    batch-mates: the batcher retries per request on batch failure."""
    import threading

    from cliora_tpu.serving import MicroBatcher

    class Picky:
        def parse(self, sentences, max_rows=None):
            if any(len(s) == 0 for s in sentences):
                raise ValueError("empty sentence")
            return [tuple(s) for s in sentences]

    mb = MicroBatcher(Picky(), max_batch=8, max_wait_ms=200.0)
    results, errors = {}, {}

    def worker(i, sents):
        try:
            results[i] = mb.submit(sents)
        except Exception as e:  # noqa: BLE001
            errors[i] = e

    threads = [
        threading.Thread(target=worker, args=(0, [[1, 2]])),
        threading.Thread(target=worker, args=(1, [[]])),   # bad
        threading.Thread(target=worker, args=(2, [[3, 4], [5]])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert results[0] == [(1, 2)]
    assert results[2] == [(3, 4), (5,)]
    assert isinstance(errors[1], ValueError)
    mb.close()
    assert not mb._thread.is_alive()


def test_params_in_args_bundle_matches_baked(rng, tmp_path):
    """Weights-as-arguments bundle == baked bundle == live parse.

    The args-mode artifact must be materially smaller (no weight
    constants), carry a params.npz sidecar, and produce identical
    trees for ragged mixed-bucket requests.
    """
    cfg = ModelConfig(size=16, input_size=24)
    params = _params(cfg)
    baked_arts = export_parser(cfg, params, [5, 9])
    args_arts = export_parser(cfg, params, [5, 9], params_in_args=True)
    # weight constants dominate even this tiny model's baked artifact
    assert len(args_arts[9]) < len(baked_arts[9])

    baked = str(tmp_path / "baked")
    light = str(tmp_path / "light")
    save_bundle(baked, cfg, baked_arts)
    save_bundle(light, cfg, args_arts, params=params)
    assert os.path.exists(os.path.join(light, "params.npz"))

    served_b = ExportedParser(baked)
    served_a = ExportedParser(light)
    assert served_a.meta["params_in_args"] is True
    sents = [list(rng.randint(2, V, n)) for n in (3, 9, 5, 7, 4)]
    assert served_a.parse(sents) == served_b.parse(sents)


def test_params_in_args_cliora_bundle(rng, tmp_path):
    """CLIORA (obj_feats) args-mode bundle: trees + attention parity."""
    cfg = ModelConfig(size=16, input_size=24, use_obj=True,
                      n_regions=4, obj_feat_size=12)
    params = _params(cfg)
    baked = str(tmp_path / "baked")
    light = str(tmp_path / "light")
    save_bundle(baked, cfg, export_parser(cfg, params, [6]))
    save_bundle(light, cfg,
                export_parser(cfg, params, [6], params_in_args=True),
                params=params)
    sents = [list(rng.randint(2, V, n)) for n in (4, 6, 3)]
    feats = rng.randn(3, 4, 12).astype(np.float32)
    trees_b, attn_b = ExportedParser(baked).parse(sents, obj_feats=feats)
    trees_a, attn_a = ExportedParser(light).parse(sents, obj_feats=feats)
    assert trees_a == trees_b
    for a, b in zip(attn_a, attn_b):
        np.testing.assert_array_equal(a, b)
