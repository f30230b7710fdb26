"""Sealed parse artifacts for serving: ``jax.export`` bundles.

Production serving wants a deployable artifact, not a Python model
tree: this module seals the jitted parse step into portable StableHLO
via ``jax.export``.  A bundle is a directory of per-bucket artifacts
(one per padded sentence length, the repo's compiled-shape discipline)
plus a ``manifest.json``; the loader pads each request to its bucket,
masks by true length (the same traced ``lengths`` mechanics as
``--n_length_buckets`` training), and decodes trees host-side.

Weights travel one of two ways (``export_parser(params_in_args=...)``):
as the artifacts' first ARGUMENT with a ``params.npz`` sidecar the
loader uploads to the device once (the default -- small artifacts,
small cached executables, fast restart), or BAKED into every artifact
as StableHLO constants (the classic fully-sealed form; each per-shape
executable then carries the full weights, which over a remote-device
link dominates restart latency -- measured in BASELINE.md round 5).

The batch dimension is exported *symbolically* (shape polymorphism), so
one artifact serves any batch size.  Artifacts can target multiple
platforms (e.g. ``["tpu", "cpu"]``) and run under any matching JAX
runtime with no model code -- the serving-side surface is
:class:`ExportedParser` only.

The reference has no serving/export story (its parse path re-builds the
torch net from flags and a checkpoint every run,
cliora/scripts/parse.py); this subsystem is TPU-native surplus.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cliora_tpu.models.config import ModelConfig

MANIFEST = "manifest.json"

# Which bundle path claimed the process-global XLA compilation cache
# (ExportedParser(cache=True)); None until the first claim.
_CACHE_OWNER: Optional[str] = None


def _parse_fn(cfg: ModelConfig, tc, params=None):
    """Length-masked parse closure.

    With ``params`` given they are BAKED into the traced function as
    constants (the sealed-artifact mode); with ``params=None`` the
    returned function takes the params pytree as its FIRST argument
    (the weights-as-arguments mode -- the exported program then
    excludes the weights, so per-shape specialized executables are
    ~20x smaller and the weights upload to the device ONCE instead of
    once per shape; see BASELINE.md "serving restart").

    Returns ``{"cky_bp": (B, ncells) int32}`` (+ ``atten_score``
    (B, L, R) for CLIORA grounding).  Mirrors Trainer._parse_step's
    eval semantics (outside pass only when the visual head needs it).
    """
    from cliora_tpu.training.trainer import forward_outputs

    def text_fn(params, tokens, lengths):
        out, _ = forward_outputs(
            cfg, tc, params, tokens, rng=None, train=False,
            with_cky=True, outside=False, lengths=lengths)
        return {"cky_bp": out.chart.cky_bp}

    def obj_fn(params, tokens, lengths, obj_feats):
        out, _ = forward_outputs(
            cfg, tc, params, tokens, obj_feats=obj_feats, rng=None,
            train=False, with_cky=True, outside=True, lengths=lengths)
        return {"cky_bp": out.chart.cky_bp,
                "atten_score": out.atten_score}

    fn = obj_fn if cfg.use_obj else text_fn
    if params is None:
        return fn
    import functools
    return functools.partial(fn, params)


def export_parser(
    cfg: ModelConfig,
    params,
    bucket_lengths: Sequence[int],
    *,
    platforms: Optional[Sequence[str]] = None,
    batch: Optional[int] = None,
    params_in_args: bool = False,
) -> Dict[int, bytes]:
    """Serialize one parse artifact per padded sentence length.

    ``batch=None`` exports a symbolic batch dimension (any B at serving
    time); an int pins it.  ``platforms`` defaults to the current
    backend; pass e.g. ``["tpu", "cpu"]`` for a portable artifact.

    ``params_in_args=False`` (classic) bakes the weights into every
    artifact as StableHLO constants; ``True`` exports them as the
    function's first argument instead -- pass the same ``params`` to
    :func:`save_bundle` so the loader can ship them as a ``params.npz``
    sidecar.  Weights-as-arguments keeps each artifact (and each
    per-shape compiled executable in the bundle's xla_cache) small and
    uploads the weights to the device once per process instead of once
    per (bucket, batch) shape -- measured on the TPU tunnel this is
    what makes server restart-from-cache fast (BASELINE.md round 5).
    """
    from jax import export as jexport

    from cliora_tpu.training.trainer import TrainConfig

    # serving never materializes the (B, B, cells, R) tensor
    tc = TrainConfig(attn_impl="chunked")
    fn = _parse_fn(cfg, tc, None if params_in_args else params)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)

    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        params) if params_in_args else None

    out = {}
    for L in sorted(set(int(x) for x in bucket_lengths)):
        assert L >= 2, f"bucket length {L} has no binary tree"
        specs = [jax.ShapeDtypeStruct((b, L), jnp.int32),
                 jax.ShapeDtypeStruct((b,), jnp.int32)]
        if cfg.use_obj:
            specs.append(jax.ShapeDtypeStruct(
                (b, cfg.n_regions, cfg.obj_feat_size), jnp.float32))
        if params_in_args:
            specs.insert(0, param_specs)
        exp = jexport.export(
            jax.jit(fn), platforms=list(platforms) if platforms else None)(
                *specs)
        out[L] = exp.serialize()
    return out


def save_bundle(path: str, cfg: ModelConfig, artifacts: Dict[int, bytes],
                *, word2idx: Optional[dict] = None,
                batch: Optional[int] = None,
                params=None,
                extra_meta: Optional[dict] = None) -> None:
    """Write a serving bundle: per-bucket artifacts + manifest (+vocab).

    ``batch`` must echo export_parser's ``batch`` argument: a pinned
    batch dimension is recorded in the manifest so the loader can chunk
    and pad requests to exactly that size (None = symbolic batch).

    ``params`` must echo export_parser's ``params_in_args=True``: the
    weights land in a ``params.npz`` sidecar (flat ``/``-joined keys,
    training/checkpoint.py conventions) that the loader uploads to the
    device once and passes as every artifact's first argument.
    """
    os.makedirs(path, exist_ok=True)
    files = {}
    for L, blob in artifacts.items():
        name = f"parse_L{L}.jaxexport"
        with open(os.path.join(path, name), "wb") as f:
            f.write(blob)
        files[str(L)] = name
    if params is not None:
        from cliora_tpu.training.checkpoint import flatten

        np.savez(os.path.join(path, "params.npz"), **flatten(params))
    meta = {
        "format": "cliora_tpu.jax.export.v1",
        "jax_version": jax.__version__,
        "bucket_lengths": sorted(artifacts),
        "files": files,
        "batch": int(batch) if batch else None,
        "params_in_args": params is not None,
        "use_obj": cfg.use_obj,
        "n_regions": cfg.n_regions if cfg.use_obj else None,
        "obj_feat_size": cfg.obj_feat_size if cfg.use_obj else None,
    }
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(meta, f, indent=2)
    if word2idx is not None:
        with open(os.path.join(path, "vocab.json"), "w") as f:
            json.dump(word2idx, f)


def _pow2_rows(n: int) -> int:
    """Smallest power of two >= n (batch-shape quantization)."""
    return 1 << max(0, n - 1).bit_length()


class ExportedParser:
    """Serve parses from a sealed bundle -- no model code, no params.

    ``parse`` takes ragged token-id sequences, groups them by the
    smallest covering bucket, pads (ids beyond the true length are
    ignored by the length mask), runs the artifact, and returns one
    binary tree per sentence as nested (start, end) span tuples
    (analysis/trees.py ``bp_to_tree``).
    """

    def __init__(self, path: str, cache: bool = False):
        from jax import export as jexport

        if cache:
            # Persist per-(bucket, batch-shape) specialized executables
            # NEXT TO THE BUNDLE via the XLA compilation cache: each
            # first hit of a concrete batch shape compiles once per
            # bundle lifetime, not once per process -- a server restart
            # re-specializes from disk in seconds instead of re-paying
            # the full warmup (113 s over the TPU tunnel, BASELINE.md).
            # Sets PROCESS-GLOBAL jax config (a pre-set
            # jax_compilation_cache_dir is respected), which is why it
            # is opt-in here; scripts/serve.py turns it on.  Only the
            # FIRST cache=True bundle per process owns the cache dir:
            # a second bundle would otherwise silently write its
            # specialized executables into the first bundle's xla_cache.
            global _CACHE_OWNER
            want = os.path.join(path, "xla_cache")
            current = jax.config.jax_compilation_cache_dir
            if not current:
                jax.config.update("jax_compilation_cache_dir", want)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1)
                _CACHE_OWNER = path
            elif os.path.abspath(current) != os.path.abspath(want):
                import warnings
                owner = _CACHE_OWNER or current
                warnings.warn(
                    f"jax compilation cache already claimed by {owner!r}; "
                    f"bundle {path!r} will share it (its executables land "
                    f"there, not in its own xla_cache/)", stacklevel=2)

        with open(os.path.join(path, MANIFEST)) as f:
            self.meta = json.load(f)
        assert self.meta["format"] == "cliora_tpu.jax.export.v1", self.meta
        self._fns = {}
        for L, name in self.meta["files"].items():
            with open(os.path.join(path, name), "rb") as f:
                self._fns[int(L)] = jexport.deserialize(f.read())
        self.bucket_lengths = sorted(self._fns)
        self._params = None
        if self.meta.get("params_in_args"):
            # weights-as-arguments bundle: rebuild the nested-dict params
            # pytree from the flat npz sidecar and upload it to the
            # device ONCE; every artifact call reuses the same device
            # arrays (a baked bundle instead re-ships the weights inside
            # every per-shape executable -- ~100 MB each on the D=400
            # model, the restart-latency driver on remote-device paths)
            tree: dict = {}
            with np.load(os.path.join(path, "params.npz"),
                         allow_pickle=False) as z:
                for key in z.files:
                    node = tree
                    *parents, leaf = key.split("/")
                    for p in parents:
                        node = node.setdefault(p, {})
                    node[leaf] = z[key]
            self._params = jax.device_put(tree)
        vocab_path = os.path.join(path, "vocab.json")
        self.word2idx = None
        if os.path.exists(vocab_path):
            with open(vocab_path) as f:
                self.word2idx = json.load(f)

    def bucket_for(self, n: int) -> int:
        for L in self.bucket_lengths:
            if L >= n:
                return L
        raise ValueError(
            f"sentence length {n} exceeds the largest exported bucket "
            f"{self.bucket_lengths[-1]}")

    def warmup(self, max_batch: int = 64) -> int:
        """Pre-specialize every (bucket, quantized-batch) shape.

        A symbolic-batch artifact re-specializes (compiles) per distinct
        concrete batch size on first hit.  Over a remote compile path
        that costs tens of seconds per shape, so an un-warmed
        micro-batching server stalls multi-second on each novel
        coalesced size (measured on the TPU tunnel: 1.9 req/s un-warmed
        vs 36.3 lock-serialized at concurrency 16 -- the power-of-two
        quantization bounds the shape count but first hits still pay).
        Call once at server startup.

        ``max_batch`` is a ROW (sentence) count, not a request count:
        afterwards every artifact call of up to ``max_batch`` rows runs
        pre-compiled.  Callers that coalesce requests must bound the
        coalesced row count to ``max_batch`` (MicroBatcher does; pass
        ``max_rows=max_batch`` to :meth:`parse` for direct calls) or
        warm up to their true worst-case row count.  Returns the number
        of artifact calls made (buckets x quantized sizes).
        """
        use_obj = bool(self.meta["use_obj"])
        pin = self.meta.get("batch")
        if pin:
            sizes = [int(pin)]
        else:
            sizes, b = [], 1
            cap = _pow2_rows(max(1, int(max_batch)))
            while b <= cap:
                sizes.append(b)
                b <<= 1
        n_calls = 0
        for L in self.bucket_lengths:
            for b in sizes:
                # length-L rows target exactly bucket L in bucket_for
                sents = [[1] * L for _ in range(b)]
                obj = None
                if use_obj:
                    obj = np.zeros(
                        (b, self.meta["n_regions"],
                         self.meta["obj_feat_size"]), np.float32)
                self.parse(sents, obj_feats=obj)
                n_calls += 1
        return n_calls

    def warmup_async(self, max_batch: int = 64):
        """:meth:`warmup` on a daemon thread; returns the Thread.

        Lets a server accept requests immediately: shapes already
        touched run warm, a request racing the warmup just blocks on
        the device like any cold first hit would.  ``jax`` dispatch is
        thread-safe (compilation is locked per-program internally), so
        the background specializations and foreground requests
        interleave safely.  Join the returned thread to know when every
        shape is warm.
        """
        import threading

        t = threading.Thread(target=self.warmup, args=(max_batch,),
                             daemon=True)
        t.start()
        return t

    def parse(self, sentences: List[Sequence[int]],
              obj_feats: Optional[np.ndarray] = None,
              max_rows: Optional[int] = None):
        """Token-id sequences -> span trees (+ per-word region argmax
        for CLIORA bundles when ``obj_feats`` (B, R, F) is given).

        ``max_rows`` caps the rows per artifact call (oversized bucket
        groups are chunked), so a caller that warmed up to N rows can
        guarantee no call exceeds the pre-compiled shapes by passing
        ``max_rows=N``."""
        from cliora_tpu.analysis.trees import decode_batch

        assert sentences
        assert all(len(s) >= 1 for s in sentences), "empty sentence"
        use_obj = bool(self.meta["use_obj"])
        if use_obj:
            assert obj_feats is not None, "CLIORA bundle needs obj_feats"
        order = sorted(range(len(sentences)),
                       key=lambda i: self.bucket_for(len(sentences[i])))
        pin = self.meta.get("batch")  # int = pinned batch dim export
        trees: dict = {}
        attn: dict = {}
        i = 0
        while i < len(order):
            L = self.bucket_for(len(sentences[order[i]]))
            group = [j for j in order[i:]
                     if self.bucket_for(len(sentences[j])) == L]
            i += len(group)
            # pinned-batch artifacts take exactly `pin` rows: chunk the
            # group and pad the tail with length-1 dummy rows (their
            # outputs are discarded); max_rows chunks symbolic-batch
            # groups so warmed callers never exceed pre-compiled shapes
            step = pin or (max_rows if max_rows else len(group))
            for c0 in range(0, len(group), step):
                chunk = group[c0:c0 + step]
                # symbolic-batch artifacts re-specialize (compile) per
                # DISTINCT concrete batch size, which over a remote
                # compile path costs seconds -- quantize the padded row
                # count to the next power of two so at most log2(B)
                # shapes ever compile.  Dummy rows are <2x and the call
                # is dispatch-dominated at the small sizes where they
                # appear.  Measured: without this, micro-batched serving
                # (variable coalesced sizes) was 4.7x SLOWER than
                # lock-serialized B=1 dispatch (bench_serving, TPU
                # 2026-08-18); with it, 6.7x faster on the CPU drive.
                nrow = pin or _pow2_rows(len(chunk))
                toks = np.zeros((nrow, L), np.int32)
                lens = np.ones((nrow,), np.int32)
                for r, j in enumerate(chunk):
                    lens[r] = len(sentences[j])
                    toks[r, :lens[r]] = np.asarray(sentences[j], np.int32)
                args = [toks, lens]
                if use_obj:
                    of = np.zeros(
                        (nrow,) + tuple(np.shape(obj_feats)[1:]),
                        np.float32)
                    of[:len(chunk)] = np.asarray(obj_feats[chunk],
                                                 np.float32)
                    args.append(of)
                if self._params is not None:
                    args.insert(0, self._params)
                res = self._fns[L].call(*args)
                bp = np.asarray(res["cky_bp"])[:len(chunk)]
                decoded = decode_batch(bp, L, lens[:len(chunk)])
                for r, j in enumerate(chunk):
                    trees[j] = decoded[r][0]
                    if use_obj:
                        a = np.asarray(res["atten_score"])[r, :lens[r]]
                        attn[j] = a.argmax(-1)
        out_trees = [trees[j] for j in range(len(sentences))]
        if use_obj:
            return out_trees, [attn[j] for j in range(len(sentences))]
        return out_trees

    def tokenize(self, sentences: List[str], *, unk: str = "<unk>"):
        """Whitespace sentences -> (token-id lists, word lists).

        One tokenization convention for every serving surface
        (parse_text and the HTTP server's "texts" path): unknown words
        map to the bundle vocab's ``unk`` entry (the readers' UNK
        convention, data/preprocessing.py).
        """
        if self.word2idx is None:
            raise ValueError("bundle has no vocab.json; send token ids")
        unk_id = self.word2idx.get(unk, 0)
        words = [s.split() for s in sentences]
        toks = [[self.word2idx.get(w, unk_id) for w in ws]
                for ws in words]
        return toks, words

    def parse_text(self, sentences: List[str], *, unk: str = "<unk>",
                   obj_feats: Optional[np.ndarray] = None):
        """Whitespace-tokenized sentences -> trees with word leaves.

        Needs the bundle's ``vocab.json``; unknown words map to ``unk``
        (the readers' UNK convention, data/preprocessing.py).
        """
        from cliora_tpu.analysis.trees import replace_leaves

        toks, _ = self.tokenize(sentences, unk=unk)
        out = self.parse(toks, obj_feats=obj_feats)
        trees = out[0] if self.meta["use_obj"] else out
        worded = [replace_leaves(t, s.split())
                  for t, s in zip(trees, sentences)]
        if self.meta["use_obj"]:
            return worded, out[1]
        return worded


class MicroBatcher:
    """Coalesce concurrent parse requests into one device call.

    HTTP handlers call :meth:`submit` from their own threads; a single
    dispatcher thread drains the queue, concatenates all pending
    sentence lists, runs ONE ``parser.parse`` over the union, and
    scatters the trees back.  Each artifact call carries fixed dispatch
    overhead and pads to a length bucket, so N concurrent 1-sentence
    requests cost ~1 call instead of N (the classic inference-server
    micro-batching pattern; the reference has no serving path at all).

    ``max_wait_ms`` bounds the added latency for the request that opens
    a batch; ``max_batch`` bounds the total number of *sentences (rows)*
    coalesced per device call -- the same unit as
    ``ExportedParser.warmup(max_batch)``, so a server warmed to N rows
    never pays a first-hit compile (oversized single requests are
    chunked to ``max_batch`` rows per artifact call by ``parse``).
    """

    def __init__(self, parser, max_batch: int = 64,
                 max_wait_ms: float = 5.0):
        import queue
        import threading

        self._parser = parser
        self._q: "queue.Queue" = queue.Queue()
        self._max_batch = max(1, int(max_batch))
        self._wait_s = max(0.0, float(max_wait_ms)) / 1e3
        self._holdover = None  # request deferred to the next batch
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    class _Req:
        __slots__ = ("sentences", "event", "result", "error")

        def __init__(self, sentences):
            import threading

            self.sentences = sentences
            self.event = threading.Event()
            self.result = None
            self.error = None

    def submit(self, sentences):
        """Token-id sequences -> trees (blocks until the batch runs)."""
        req = self._Req(sentences)
        self._q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        """Stop the dispatcher thread (in-flight requests complete)."""
        self._q.put(None)
        self._thread.join(timeout=60)

    def _loop(self):
        import queue
        import time

        while True:
            if self._holdover is not None:
                first, self._holdover = self._holdover, None
            else:
                first = self._q.get()
            if first is None:  # close() sentinel
                return
            batch = [first]
            rows = len(first.sentences)
            # monotonic: a wall-clock step must not stretch the window
            deadline = time.monotonic() + self._wait_s
            stop = False
            while rows < self._max_batch:
                timeout = deadline - time.monotonic()
                try:
                    r = (self._q.get_nowait() if timeout <= 0
                         else self._q.get(timeout=timeout))
                except queue.Empty:
                    break
                if r is None:
                    stop = True
                    break
                if rows + len(r.sentences) > self._max_batch:
                    # would overflow the warmed row budget: it opens
                    # the next batch instead (queue has no push-front)
                    self._holdover = r
                    break
                batch.append(r)
                rows += len(r.sentences)
            try:
                flat = [s for r in batch for s in r.sentences]
                trees = self._parser.parse(flat, max_rows=self._max_batch)
                i = 0
                for r in batch:
                    r.result = trees[i:i + len(r.sentences)]
                    i += len(r.sentences)
            except Exception:
                # don't poison the whole batch with one bad request
                # (over-length sentence, empty list): retry each request
                # alone so only the offender fails
                for r in batch:
                    try:
                        r.result = self._parser.parse(
                            r.sentences, max_rows=self._max_batch)
                    except Exception as e:  # noqa: BLE001 -- per request
                        r.error = e
            for r in batch:
                r.event.set()
            if stop:
                return
