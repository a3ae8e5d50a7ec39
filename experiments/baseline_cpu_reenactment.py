"""Measured Keras-CPU baseline: a faithful re-enactment of the reference
explain-one-image pipeline, executed on this host's CPU.

WHY. bench.py's ``vs_baseline`` used to divide by an ANALYTICAL estimate
(0.05 img/s) of the Keras reference's CPU throughput, because the reference
stack (Python 3.5 / Keras 2.2.4 / TF1) is not installable here. This script
replaces the estimate with a measurement by executing the reference's EXACT
execution plan — same operations, same loop structure, same per-word
graph-level work — using the same class of CPU kernels TF1-CPU would use
(torch's MKL-DNN convs for the graph ops, plain numpy for the reference's
numpy loops).

THE PLAN BEING RE-ENACTED (citations into /root/reference):
  1. Beam-search caption, beam 3, 20 steps (models/explainers.py:51-120):
     every beam step calls ``keras_model.predict_on_batch`` on the FULL
     teacher-forcing training graph — VGG16 forward INCLUDED — once per
     surviving beam candidate set (1 call at step 0, beam_size calls per
     later step => 1 + 19*3 = 58 full-graph runs per image).
  2. ``_forward_beam_search`` (explainers.py:370-436): one more
     ``image_model.predict`` (VGG16 forward) plus a numpy decoder forward
     that caches every intermediate state, including the literal
     ``for i in range(self.L)`` Python loop over the 196-way
     image_features dense (explainers.py:378-380).
  3. Per explained word: ``_explain_lstm_single_word_sequence``
     (explainers.py:537-666) — numpy LRP BPTT with the reference's exact
     rule call structure: ``_propagate_relevance_linear_lrp``
     (explainers.py:156-165) materialises a (D, O) attribution matrix per
     call, identity-weight calls included; the ``for i in range(self.L)``
     tail makes 3 rule calls of (512, 512) per grid location.
  4. Per explained word: ``_explain_CNN`` (explainers.py:179-181) — one
     reversed-VGG LRPSequentialPresetA pass (alpha1beta0 on every conv,
     relevance_analyzer.py:695-721; WTA on maxpools, 459-482). iNNvestigate
     builds this as a static Keras graph whose AlphaBetaRule computes
     conv(x+, w+) and conv(x-, w-) plus the two matching transposed convs
     per layer (relevance_rule.py:274-322; the inhibitor half is skipped
     for beta=0, :313-322) — re-enacted with torch conv2d /
     torch.nn.grad.conv2d_input, which use the same MKL class of kernels
     TF1-CPU would.

FAIRNESS. Everything that TF1 would run as a compiled graph op (VGG
forward, the reversed-VGG LRP graph, the K.rnn decoder steps) is executed
here with MKL-backed torch/numpy matmuls at full precision — i.e. the
re-enactment grants the reference graph-engine-quality kernels and charges
it NO Keras session/feed overhead, no graph-rebuild cost, and no
matplotlib/IO. Only the parts that are literal Python/numpy loops in the
reference (the decoder LRP BPTT, the L=196 rule loops) are run as literal
Python/numpy loops, because that IS the reference implementation.

PROTOCOL. T=20 words explained per image (bench.py's fixed-T protocol),
224x224x3 input, vocab 7003, hidden=embed=512, L=196, D=512 (FlickrConfig,
reference config.py:6-56). Weights random with fixed seed — per-op cost is
weight-independent. Reports per-stage seconds and img/s; writes
experiments/BASELINE_CPU_MEASURED.json. The host is recorded in the output;
on this 1-vCPU runner the official bench.py denominator applies a
documented perfect-scaling multi-core allowance on top of this measurement
(see BASELINE.md).

Run: python experiments/baseline_cpu_reenactment.py [--images N] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

import numpy as np
import torch

torch.set_num_threads(max(1, os.cpu_count() or 1))

HIDDEN = 512
EMBED = 512
VOCAB = 7003
L = 196
D = 512
T = 20
BEAM = 3
EPS_LRP = 0.01  # reference model.py:23 (decoder rules use K.epsilon below)
K_EPSILON = 1e-7  # Keras default K.epsilon(), used by explainers.py:157

# VGG16 conv stack up to block5_conv3 (the reference taps block5_conv3,
# explainers.py:29-30): (name, in_ch, out_ch), pools after blocks 1-4.
VGG_LAYERS = [
    ("block1_conv1", 3, 64), ("block1_conv2", 64, 64), ("pool", 64, 64),
    ("block2_conv1", 64, 128), ("block2_conv2", 128, 128), ("pool", 128, 128),
    ("block3_conv1", 128, 256), ("block3_conv2", 256, 256), ("block3_conv3", 256, 256), ("pool", 256, 256),
    ("block4_conv1", 256, 512), ("block4_conv2", 512, 512), ("block4_conv3", 512, 512), ("pool", 512, 512),
    ("block5_conv1", 512, 512), ("block5_conv2", 512, 512), ("block5_conv3", 512, 512),
]


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x, axis=0):
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


# ---------------------------------------------------------------- weights


def make_weights(rng: np.random.RandomState, image_hw: int):
    w = {}
    for name, cin, cout in VGG_LAYERS:
        if name == "pool":
            continue
        w[name + "/k"] = torch.from_numpy(
            rng.randn(cout, cin, 3, 3).astype(np.float32) * (2.0 / (9 * cin)) ** 0.5
        )
        w[name + "/b"] = torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.01)
    # decoder weights, reference layer names (model.py:434-466, 555-571)
    w["image_features/W"] = rng.randn(D, HIDDEN).astype(np.float32) * 0.02
    w["image_features/b"] = np.zeros(HIDDEN, np.float32)
    w["global_img_feature/W"] = rng.randn(D, EMBED).astype(np.float32) * 0.02
    w["global_img_feature/b"] = np.zeros(EMBED, np.float32)
    w["embedding"] = rng.randn(VOCAB, EMBED).astype(np.float32) * 0.02
    w["lstm/Wi"] = rng.randn(EMBED * 2, 4 * HIDDEN).astype(np.float32) * 0.02
    w["lstm/Wh"] = rng.randn(HIDDEN, 4 * HIDDEN).astype(np.float32) * 0.02
    w["lstm/b"] = np.zeros(4 * HIDDEN, np.float32)
    for n, shp in [("Wv", (HIDDEN, HIDDEN)), ("Wg", (HIDDEN, HIDDEN)),
                   ("Wx", (EMBED * 2, HIDDEN)), ("Wh2", (HIDDEN, HIDDEN)),
                   ("Ws", (HIDDEN, HIDDEN))]:
        w["att/" + n] = rng.randn(*shp).astype(np.float32) * 0.02
    w["att/V"] = rng.randn(HIDDEN, 1).astype(np.float32) * 0.02
    w["output/W"] = rng.randn(HIDDEN, VOCAB).astype(np.float32) * 0.02
    w["output/b"] = np.zeros(VOCAB, np.float32)
    return w


# ------------------------------------------------------- VGG graph ops


def vgg_forward(w, img_t: torch.Tensor, cache: bool):
    """VGG16 forward to block5_conv3; NCHW torch. Returns (features, acts).

    acts[i] is the INPUT to layer i of VGG_LAYERS (what each LRP rule needs),
    mirroring the tensors iNNvestigate's reversed graph wires in."""
    acts = []
    x = img_t
    with torch.no_grad():
        for name, _cin, _cout in VGG_LAYERS:
            acts.append(x if cache else None)
            if name == "pool":
                x = torch.nn.functional.max_pool2d(x, 2)
            else:
                x = torch.nn.functional.conv2d(x, w[name + "/k"], w[name + "/b"], padding=1)
                x = torch.relu(x)
    return x, acts


def cnn_lrp_preset_a(w, acts, rel_seed_np: np.ndarray) -> np.ndarray:
    """One reversed-VGG LRPSequentialPresetA pass (alpha1beta0 every conv,
    WTA maxpool), exactly the static graph iNNvestigate builds
    (relevance_rule.py:274-322): conv(x+,w+), conv(x-,w-), SafeDivide,
    two transposed convs, re-weight by x+ / x-. Returns (H, W, 3) relevance.
    """
    side = int(np.sqrt(rel_seed_np.size // D))
    r = torch.from_numpy(
        rel_seed_np.reshape(1, side, side, D).transpose(0, 3, 1, 2).copy()
    )
    with torch.no_grad():
        for i in range(len(VGG_LAYERS) - 1, -1, -1):
            name, _cin, _cout = VGG_LAYERS[i]
            x = acts[i]
            if name == "pool":
                _, idx = torch.nn.functional.max_pool2d(x, 2, return_indices=True)
                r = torch.nn.functional.max_unpool2d(r, idx, 2, output_size=x.shape[-2:])
            else:
                k = w[name + "/k"]
                b = w[name + "/b"]
                kp, kn = k.clamp(min=0), k.clamp(max=0)
                bp = b.clamp(min=0)
                xp, xn = x.clamp(min=0), x.clamp(max=0)
                # activator z+ (beta=0 skips the inhibitor, rule:313-322);
                # the graph computes BOTH convs even where x- == 0.
                zp = (torch.nn.functional.conv2d(xp, kp, padding=1)
                      + torch.nn.functional.conv2d(xn, kn, padding=1)
                      + bp.view(1, -1, 1, 1))
                s = r / torch.where(zp == 0, torch.ones_like(zp), zp)
                rp = torch.nn.grad.conv2d_input(list(x.shape), kp, s, padding=1)
                rn = torch.nn.grad.conv2d_input(list(x.shape), kn, s, padding=1)
                r = xp * rp + xn * rn
    return r[0].numpy().transpose(1, 2, 0)


# ------------------------------------------------ decoder (numpy, faithful)


class AdaptiveDecoderReenactment:
    """Numpy re-enactment of the reference adaptive-attention explainer
    (ExplainImgCaptioningAdaptiveAttention, explainers.py:260-666): same
    state caching, same rule call structure, same Python loop shapes."""

    def __init__(self, w):
        self.w = w

    # ---- the Keras training graph, as predict_on_batch would run it ----

    def predict_full_graph(self, w, img_t, caption_ids):
        """Full teacher-forcing graph: VGG fwd + dense taps + T-step decoder.
        This is what every beam step re-runs (explainers.py:73)."""
        feats_t, _ = vgg_forward(w, img_t, cache=False)
        feats = feats_t[0].numpy().transpose(1, 2, 0).reshape(L, D)
        img_feats = np.maximum(feats @ w["image_features/W"] + w["image_features/b"], 0)
        gif = np.maximum(
            feats.mean(0) @ w["global_img_feature/W"] + w["global_img_feature/b"], 0
        )
        tot_static = img_feats @ w["att/Wv"]
        ht = np.zeros(HIDDEN, np.float32)
        ct = np.zeros(HIDDEN, np.float32)
        logits = np.zeros((len(caption_ids), VOCAB), np.float32)
        for t, tok in enumerate(caption_ids):
            # caption_ids are 1-based label-encoded tokens (SOS=1); the
            # embedding table is 0-based — same convention as
            # forward_beam_search below (w["embedding"][tok - 1])
            xt = np.concatenate([self.w["embedding"][tok - 1], gif])
            z = xt @ w["lstm/Wi"] + ht @ w["lstm/Wh"] + w["lstm/b"]
            i = sigmoid(z[:HIDDEN])
            f = sigmoid(z[HIDDEN:2 * HIDDEN])
            g = z[2 * HIDDEN:3 * HIDDEN]
            o = sigmoid(z[3 * HIDDEN:])
            st_gate = sigmoid(xt @ w["att/Wx"] + ht @ w["att/Wh2"])
            ct = f * ct + i * np.tanh(g)
            ht = o * np.tanh(ct)
            st = np.tanh(ct) * st_gate
            ht_proj = ht @ w["att/Wg"]
            att_logit = np.tanh(ht_proj[None, :] + tot_static) @ w["att/V"]
            zt_ext = np.tanh(st @ w["att/Ws"] + ht_proj) @ w["att/V"]
            ab = softmax(np.concatenate([att_logit[:, 0], zt_ext]), axis=0)
            alpha, beta = ab[:L] / max(1e-12, ab[:L].sum()), ab[-1]
            context = (alpha[:, None] * img_feats).sum(0)
            c_hat = beta * st + (1 - beta) * context
            logits[t] = (ht + c_hat) @ w["output/W"] + w["output/b"]
        return logits

    def beam_search(self, img_t, steps=T, beam=BEAM):
        """Reference beam loop (explainers.py:51-120): per step, one
        predict_on_batch of the FULL graph per surviving candidate set."""
        w = self.w
        partial = [([1], 0.0)]  # (tokens, log_prob); SOS id 1
        n_predicts = 0
        for _step in range(steps):
            cand = []
            for tokens, lp in partial:
                preds = self.predict_full_graph(w, img_t, tokens)
                n_predicts += 1
                last = preds[-1]
                last = last - last.max()
                logp = last - np.log(np.exp(last).sum())
                top = np.argpartition(logp, -beam)[-beam:]
                for tok in top:
                    cand.append((tokens + [int(tok) + 1], lp + float(logp[tok])))
            cand.sort(key=lambda c: -c[1])
            partial = cand[:beam]
        return partial[0][0][1:], n_predicts

    # ---- numpy forward with full state caching (explainers.py:370-436) ----

    def forward_beam_search(self, img_t, caption_ids):
        w = self.w
        feats_t, acts = vgg_forward(w, img_t, cache=True)
        self._acts = acts
        self._img_feature_input = feats_t[0].numpy().transpose(1, 2, 0).reshape(L, D)
        # the literal per-location dense loop, explainers.py:377-380
        self._image_features_before_act = np.zeros((L, HIDDEN), np.float32)
        for i in range(L):
            self._image_features_before_act[i] = (
                self._img_feature_input[i] @ w["image_features/W"] + w["image_features/b"]
            )
        self._image_features = np.maximum(self._image_features_before_act, 0)
        self._average_img_feature = self._img_feature_input.mean(0)
        self._global_img_feature_before_act = (
            self._average_img_feature @ w["global_img_feature/W"] + w["global_img_feature/b"]
        )
        self._global_img_feature = np.maximum(self._global_img_feature_before_act, 0)
        tot_static = self._image_features @ w["att/Wv"]

        n = len(caption_ids)
        self.caption = caption_ids
        self.ht = np.zeros((n + 1, HIDDEN), np.float32)
        self.ct = np.zeros((n + 1, HIDDEN), np.float32)
        self.gt = np.zeros((n + 1, HIDDEN), np.float32)
        self.it_act = np.zeros((n + 1, HIDDEN), np.float32)
        self.ft_act = np.zeros((n + 1, HIDDEN), np.float32)
        self.context = np.zeros((n + 1, HIDDEN), np.float32)
        self.attention = np.zeros((n + 1, L), np.float32)
        self.st = np.zeros((n + 1, HIDDEN), np.float32)
        self.beta = np.zeros((n + 1, 1), np.float32)
        self.c_hat = np.zeros((n + 1, HIDDEN), np.float32)
        self.xt = np.zeros((n, EMBED * 2), np.float32)
        self.caption_preds = np.zeros((n, VOCAB), np.float32)
        for t in range(n):
            tok = 1 if t == 0 else caption_ids[t - 1]
            self.xt[t] = np.concatenate(
                [w["embedding"][tok - 1], self._global_img_feature]
            )
            htm1, ctm1 = self.ht[t], self.ct[t]
            z = self.xt[t] @ w["lstm/Wi"] + htm1 @ w["lstm/Wh"] + w["lstm/b"]
            i = sigmoid(z[:HIDDEN])
            f = sigmoid(z[HIDDEN:2 * HIDDEN])
            g = z[2 * HIDDEN:3 * HIDDEN]
            o = sigmoid(z[3 * HIDDEN:])
            ct = f * ctm1 + i * np.tanh(g)
            ht = o * np.tanh(ct)
            st = np.tanh(ct) * sigmoid(self.xt[t] @ w["att/Wx"] + htm1 @ w["att/Wh2"])
            ht_proj = ht @ w["att/Wg"]
            att_logit = (np.tanh(ht_proj[None, :] + tot_static) @ w["att/V"])[:, 0]
            zt_ext = np.tanh(st @ w["att/Ws"] + ht_proj) @ w["att/V"]
            ab = softmax(np.concatenate([att_logit, zt_ext]), axis=0)
            alpha, beta = ab[:L], ab[-1]
            alpha = alpha / max(1e-12, alpha.sum())
            context = (alpha[:, None] * self._image_features).sum(0)
            self.ht[t + 1], self.ct[t + 1], self.gt[t + 1] = ht, ct, g
            self.it_act[t + 1], self.ft_act[t + 1] = i, f
            self.st[t + 1], self.beta[t + 1, 0] = st, beta
            self.context[t + 1] = context
            self.attention[t + 1] = alpha
            self.c_hat[t + 1] = beta * st + (1 - beta) * context
            self.caption_preds[t] = (ht + self.c_hat[t + 1]) @ w["output/W"] + w["output/b"]

    # ---- the LRP rule and BPTT, loop-for-loop (explainers.py:156-165, 537-666)

    @staticmethod
    def lrp_linear(r_in, forward_input, forward_output, bias, bias_nb_units,
                   weight, bias_factor=0, eps=K_EPSILON):
        sign_z = np.ones(forward_output.shape, np.float32)
        sign_z[forward_output < 0] = -1
        z = forward_output + sign_z * eps
        attribution = weight * forward_input[:, None] + (
            (bias_factor * bias[None, :]) / bias_nb_units
        )
        attribution_norm = attribution / z
        return np.sum(attribution_norm * r_in, axis=1)

    def explain_word_sequence(self, t):
        w = self.w
        rule = self.lrp_linear
        eye = np.identity(HIDDEN, np.float32)
        cap_enc = self.caption[t - 1] - 1
        rel = np.zeros((1, VOCAB), np.float32)
        rel[0, cap_enc] = self.caption_preds[t - 1, cap_enc]
        weight_g = np.vstack([
            np.split(w["lstm/Wi"], 4, 1)[2], np.split(w["lstm/Wh"], 4, 1)[2]
        ])
        bias_g = np.split(w["lstm/b"], 4)[2]
        zeros_h = np.zeros(HIDDEN, np.float32)
        r_ht = np.zeros((t + 1, HIDDEN), np.float32)
        r_ct = np.zeros((t + 1, HIDDEN), np.float32)
        r_global = np.zeros(EMBED, np.float32)
        r_V = np.zeros((L, HIDDEN), np.float32)
        r_img = np.zeros((L, D), np.float32)

        r_ht_context = rule(rel, self.ht[t] + self.c_hat[t], self.caption_preds[t - 1],
                            w["output/b"], HIDDEN, w["output/W"])
        r_ht[t] = rule(r_ht_context[None, :], self.ht[t], self.ht[t] + self.c_hat[t],
                       zeros_h, HIDDEN, eye)
        r_c_hat = rule(r_ht_context[None, :], self.c_hat[t], self.ht[t] + self.c_hat[t],
                       zeros_h, HIDDEN, eye)
        r_context = rule(r_c_hat[None, :], (1 - self.beta[t, 0]) * self.context[t],
                         self.c_hat[t], zeros_h, HIDDEN, eye)
        r_st = rule(r_c_hat[None, :], self.beta[t, 0] * self.st[t], self.c_hat[t],
                    zeros_h, HIDDEN, eye)
        r_ct[t] = r_st
        for i in range(t)[::-1]:
            r_ct[i + 1] += r_ht[i + 1]
            r_gt = rule(r_ct[i + 1][None, :],
                        self.it_act[i + 1] * np.tanh(self.gt[i + 1]),
                        self.ct[i + 1], zeros_h, HIDDEN, eye)
            r_ct[i] = rule(r_ct[i + 1][None, :],
                           self.ft_act[i + 1] * self.ct[i],
                           self.ct[i + 1], zeros_h, HIDDEN, eye)
            xht = np.concatenate([self.xt[i], self.ht[i]])
            r_xht = rule(r_gt[None, :], xht, self.gt[i + 1], bias_g, len(xht), weight_g)
            r_ht[i] = r_xht[EMBED * 2:]
            r_global += r_xht[EMBED:EMBED * 2]
        r_avg = rule(r_global[None, :], self._average_img_feature,
                     self._global_img_feature_before_act,
                     w["global_img_feature/b"], D, w["global_img_feature/W"])
        eye_d = np.identity(D, np.float32)
        zeros_d = np.zeros(D, np.float32)
        for i in range(L):
            r_img[i] = rule(r_avg[None, :], self._img_feature_input[i] / L,
                            self._average_img_feature, zeros_d, D, eye_d)
            r_V[i] = rule(r_context[None, :],
                          self._image_features[i] * self.attention[t, i],
                          self.context[t], zeros_h, HIDDEN, eye)
            r_img[i] += rule(r_V[i][None, :], self._img_feature_input[i],
                             self._image_features_before_act[i],
                             w["image_features/b"], D, w["image_features/W"])
        return r_img.reshape(1, 14, 14, D)


# --------------------------------------------------------------- driver


def run(n_images: int, quick: bool):
    rng = np.random.RandomState(0)
    w = make_weights(rng, 224)
    dec = AdaptiveDecoderReenactment(w)
    words = 3 if quick else T
    steps = 3 if quick else T

    stage = {"beam_s": [], "forward_s": [], "decoder_lrp_s": [], "cnn_lrp_s": []}
    for n in range(n_images):
        img = rng.randn(1, 3, 224, 224).astype(np.float32)
        img_t = torch.from_numpy(img)

        t0 = time.perf_counter()
        caption, n_predicts = dec.beam_search(img_t, steps=steps)
        stage["beam_s"].append(time.perf_counter() - t0)

        # fixed-T protocol: explain exactly `words` words regardless of the
        # (random-weight) beam output — per-word cost is token-independent
        caption = (caption * ((words // max(1, len(caption))) + 1))[:words]
        caption = [max(2, min(VOCAB, c)) for c in caption]

        t0 = time.perf_counter()
        dec.forward_beam_search(img_t, caption)
        stage["forward_s"].append(time.perf_counter() - t0)

        td = tc = 0.0
        for t in range(1, words + 1):
            t0 = time.perf_counter()
            r_seed = dec.explain_word_sequence(t)
            td += time.perf_counter() - t0
            t0 = time.perf_counter()
            cnn_lrp_preset_a(w, dec._acts, r_seed)
            tc += time.perf_counter() - t0
        stage["decoder_lrp_s"].append(td)
        stage["cnn_lrp_s"].append(tc)
        per_img = sum(s[-1] for s in stage.values())
        print(f"image {n}: beam {stage['beam_s'][-1]:.1f}s ({n_predicts} full-graph "
              f"predicts) fwd {stage['forward_s'][-1]:.1f}s decoder-LRP {td:.1f}s "
              f"cnn-LRP {tc:.1f}s total {per_img:.1f}s", flush=True)

    med = {k: float(np.median(v)) for k, v in stage.items()}
    total = sum(med.values())
    explain_only = med["forward_s"] + med["decoder_lrp_s"] + med["cnn_lrp_s"]
    out = {
        "protocol": "faithful CPU re-enactment of reference explain-one-image "
                    "(beam-3 caption via 58 full-graph predicts + numpy decoder "
                    f"LRP BPTT + reversed-VGG PresetA per word), T={words}",
        "host": {"cpu": platform.processor() or "x86_64",
                 "n_threads": torch.get_num_threads(),
                 "nproc": os.cpu_count()},
        "n_images": n_images,
        "stage_seconds_median": med,
        "seconds_per_image": total,
        "img_per_s_full": 1.0 / total,
        "img_per_s_explain_only": 1.0 / explain_only,
        "notes": "img_per_s_explain_only grants the reference a free caption "
                 "stage; both are single-process numbers as the reference is "
                 "single-process (SURVEY.md 2.11).",
    }
    print(json.dumps(out))
    if not quick:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_CPU_MEASURED.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="3 words / 3 beam steps, no json write (self-test)")
    args = ap.parse_args()
    run(args.images, args.quick)
