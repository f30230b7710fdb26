"""Minimal HTTP parse server over a sealed bundle (stdlib only).

Serves an exported bundle (scripts/export_model.py) with no model code
on the request path -- the artifact is the model::

    python -m cliora_tpu.scripts.serve --bundle log/<exp>/bundle \
        [--host 127.0.0.1] [--port 8000]

API (JSON over POST /parse):

    {"sentences": [[7, 3, 9], ...]}        token ids, or
    {"texts": ["the dog runs", ...]}       whitespace words (needs the
                                           bundle's vocab.json)
    -> {"trees": [...]} nested [start, end] span lists (leaves are word
       positions or words, matching the request form)

GET /healthz returns bundle metadata.  Concurrency: concurrent /parse
requests are *micro-batched* -- a dispatcher thread coalesces everything
queued within ``--max_wait_ms`` into ONE device call
(serving.MicroBatcher), so N concurrent small requests cost ~1 artifact
dispatch instead of N.  One artifact serves any batch size (symbolic
batch dim).

The reference has no serving path at all (cliora/scripts/parse.py
rebuilds the torch net from flags per run); TPU-native surplus.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from cliora_tpu.serving import ExportedParser, MicroBatcher


def _tupleize(tree):
    """Nested tuples -> JSON-serializable nested lists."""
    if isinstance(tree, tuple):
        return [_tupleize(t) for t in tree]
    return tree


def make_server(bundle: str, host: str = "127.0.0.1", port: int = 8000,
                max_batch: int = 64, max_wait_ms: float = 5.0,
                warm: bool = True, cache: bool = True,
                warm_async: bool = False):
    # cache=True: specialized executables persist in <bundle>/xla_cache,
    # so a server RESTART re-warms from disk in seconds instead of
    # recompiling every (bucket, batch) shape (113 s over the TPU
    # tunnel, BASELINE.md)
    parser = ExportedParser(bundle, cache=cache)
    if parser.meta["use_obj"]:
        raise SystemExit(
            "serve.py handles text bundles; CLIORA bundles need region "
            "features per request -- use cliora_tpu.serving.ExportedParser "
            "directly")
    if warm and warm_async:
        # serve immediately; shapes pre-specialize in the background
        # (a request racing the warmup blocks like a cold hit would)
        parser.warmup_async(max_batch)
        print("warmup: running in background (--warm_async)", flush=True)
    elif warm:
        # pre-specialize every (bucket, quantized-batch) shape so no
        # request ever pays a first-hit compile (tens of seconds over a
        # remote compile path).  Sound because warmup's max_batch and
        # MicroBatcher's max_batch share the same unit (sentence rows):
        # the batcher never coalesces past max_batch rows and chunks
        # oversized single requests (serving.MicroBatcher docstring).
        import time

        t0 = time.time()
        n = parser.warmup(max_batch)
        print(f"warmup: {n} shapes in {time.time() - t0:.1f}s",
              flush=True)
    batcher = MicroBatcher(parser, max_batch=max_batch,
                           max_wait_ms=max_wait_ms)

    def parse_request(req):
        """texts/sentences -> trees; tokenization happens on the handler
        thread, only the device call is funneled through the batcher."""
        if "texts" in req:
            toks, words = parser.tokenize(req["texts"])
            trees = batcher.submit(toks)
            from cliora_tpu.analysis.trees import replace_leaves
            return [replace_leaves(t, ws)
                    for t, ws in zip(trees, words)]
        return batcher.submit(req["sentences"])

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "meta": parser.meta})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/parse":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                trees = parse_request(req)
                self._reply(200, {"trees": [_tupleize(t) for t in trees]})
            except Exception as e:  # noqa: BLE001 -- surface to client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.batcher = batcher  # callers stop the dispatcher via .close()
    return srv


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bundle", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8000, type=int)
    p.add_argument("--max_batch", default=64, type=int,
                   help="max sentences (rows) coalesced per device call; "
                        "also the warmup row budget, so warmed servers "
                        "never pay a first-hit compile")
    p.add_argument("--max_wait_ms", default=5.0, type=float,
                   help="micro-batching window: extra latency the first "
                        "request in a batch may pay to collect peers")
    p.add_argument("--no_warm", action="store_true",
                   help="skip the startup shape warmup (first request "
                        "per novel batch size then pays its compile)")
    p.add_argument("--warm_async", action="store_true",
                   help="warm shapes on a background thread and accept "
                        "requests immediately (time-to-first-response "
                        "beats blocking warmup; requests racing the "
                        "warmup block like cold hits)")
    p.add_argument("--no_cache", action="store_true",
                   help="don't persist specialized executables in "
                        "<bundle>/xla_cache (a restart then re-pays the "
                        "full per-shape compile warmup)")
    options = p.parse_args(args)
    srv = make_server(options.bundle, options.host, options.port,
                      max_batch=options.max_batch,
                      max_wait_ms=options.max_wait_ms,
                      warm=not options.no_warm,
                      cache=not options.no_cache,
                      warm_async=options.warm_async)
    print(f"serving {options.bundle} on "
          f"http://{options.host}:{srv.server_address[1]}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
