"""Measure the reference PyTorch implementation's training throughput.

Runs the actual reference code (mounted read-only at /root/reference) on
synthetic tensors matching the CLIORA Flickr training envelope, on this
host's CPU (no CUDA here; the reference's GPU numbers were never
published -- BASELINE.md).  The result is recorded in BASELINE.md and
baked into bench.py as the ``vs_baseline`` denominator.

Usage: python tools/measure_reference_baseline.py [--steps 10]
"""

import argparse
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--length", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=400)
    ap.add_argument("--emb", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--k-neg", type=int, default=100)
    ap.add_argument("--mode", choices=["cliora", "diora"], default="cliora")
    args = ap.parse_args()

    from cliora.net.trainer import (
        ContrastiveLoss,
        Embed,
        ReconstructionSoftmaxLoss,
        VGLoss,
    )
    from cliora.net.utils import ImageEncoder

    if args.mode == "cliora":
        from cliora.net.cliora import DioraMLP
    else:
        from cliora.net.diora import DioraMLP

    torch.manual_seed(0)
    emb_layer = torch.nn.Embedding(args.vocab, args.emb)
    embed = Embed(emb_layer, input_size=args.emb, size=args.hidden)
    img_enc = ImageEncoder(input_size=2048, size=args.hidden)
    diora = DioraMLP(args.hidden, outside=True, normalize="unit",
                     compress=False, share=True)
    recon = ReconstructionSoftmaxLoss(
        emb_layer, input_size=args.emb, size=args.hidden,
        margin=1, k_neg=args.k_neg, cuda=False)
    vg = VGLoss(alpha_vg=1.0)
    contr = ContrastiveLoss(margin=0.2, alpha_contr=1.0)

    params = (list(embed.parameters()) + list(diora.parameters())
              + list(recon.parameters()) + list(img_enc.parameters()))
    # dedupe (embedding table shared between Embed and the loss)
    seen, uniq = set(), []
    for p in params:
        if id(p) not in seen:
            seen.add(id(p))
            uniq.append(p)
    opt = torch.optim.Adam(uniq, lr=5e-4, betas=(0.9, 0.999), eps=1e-8)

    B, L = args.batch, args.length
    sents = torch.randint(0, args.vocab, (B, L))
    neg = torch.from_numpy(
        np.random.choice(args.vocab, args.k_neg, replace=False))
    obj_feats = torch.randn(B, 36, 2048)

    def step():
        opt.zero_grad()
        e_span, e_word = embed(sents)
        if args.mode == "cliora":
            o_span, o_word = img_enc(obj_feats)
            diora(e_span, e_word, o_span, o_word)
        else:
            diora(e_span, e_word, None, None)
        loss, _ = recon(sents, neg, diora, {})
        if args.mode == "cliora":
            l2, _ = vg(sents, diora.vg_atten_score)
            l3, _ = contr(sents, diora)
            loss = loss + l2 + l3
        loss.backward()
        torch.nn.utils.clip_grad_norm_(uniq, 5.0)
        opt.step()
        return float(loss.detach())

    for _ in range(args.warmup):
        step()
    t0 = time.time()
    for _ in range(args.steps):
        last = step()
    dt = time.time() - t0
    sps = B * args.steps / dt
    print(f"mode={args.mode} B={B} L={L} D={args.hidden} k={args.k_neg}")
    print(f"torch-cpu reference: {dt/args.steps*1000:.1f} ms/step, "
          f"{sps:.2f} sentences/sec (last loss {last:.3f})")


if __name__ == "__main__":
    main()
