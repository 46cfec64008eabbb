"""Generate the in-repo demo vocab files (saved_models/math_recog/*).

The reference ships per-release vocab files produced by its arXiv-scrape
vocab builder (``doc2tex/tools/build_data/generate_latex_vocab.py`` —
UNK-thresholded, several hundred tokens).  We have no scrape in-container,
so the shipped vocabs are the KaTeX-inventory hard vocabulary
(doc2tex_tpu.data.synthetic.hard_vocab — same scale, same token style).

Run: python tools/gen_demo_vocab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doc2tex_tpu.data.synthetic import hard_vocab
from doc2tex_tpu.tokenizer.vocab import save_vocab


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vocab = hard_vocab()
    for version in ("version1", "version2"):
        out = os.path.join(
            root, "saved_models", "math_recog", version, "vocab.txt"
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        save_vocab(vocab, out)
        print(f"{out}: {len(vocab)} tokens")


if __name__ == "__main__":
    main()
