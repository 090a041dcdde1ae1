"""Closed-loop semantic testbed (VERDICT r4 next-#1).

The reference's raison d'être is that optimized blend weights improve
object recall / relation accuracy / CLIP fidelity
(`ldm/models/diffusion/plms.py:249-273`, scored by
`evaluation/detector_result_gpt.py:164-166`).  With the SD/CLIP blobs
absent from this environment, that claim can only be evidenced by a
self-contained loop: train a tiny LDM + tiny contrastive CLIP on synthetic
colored-shape scenes with known layouts, detect objects with a
weights-independent ORACLE (color/shape thresholding), and show the
spacetime optimization beating vanilla on the reference's own metrics
beyond seed noise.

Components:
  scenes.py  — scene rendering, captions, word-level tokenizer, configs
  oracle.py  — weights-independent color/shape detector (protocol-compatible
               `eval.metrics.Detection` output)
Training driver: scripts/train_testbed.py; evaluation driver:
scripts/method_eval_testbed.py (writes METHOD_EVAL_*.json).
"""
