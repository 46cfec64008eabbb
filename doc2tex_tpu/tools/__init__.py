"""Offline tooling: data building, rendering, image-metric evaluation.

Mirrors the reference ``doc2tex/tools/`` tree (SURVEY.md section 2.7):
vocab construction, LMDB building, LaTeX rendering, image-based metrics,
arXiv collection — rebuilt on the doc2tex_tpu data layer and native kernels.
"""
