"""LaTeX pipeline tests: tokenizer (native vs Python twin), extract,
demacro, postprocess, metrics kernels."""

import numpy as np
import pytest

from doc2tex_tpu.latex import (
    Postprocessing,
    find_math,
    normalize_formula,
    pydemacro,
    remove_redundant_array_env,
    remove_redundant_bracket,
    standardize_whitespace,
)
from doc2tex_tpu.latex.pytok import normalize_string as py_normalize

CORPUS = [
    r"x^2 + y_1 = \frac12",
    r"\frac{a+b}{c} \cdot \sqrt[3]{x}",
    r"{\rm Tr}\, M = \sum_{i=1}^{N} \lambda_i",
    r"E = mc^2 \label{eq:emc}",
    r"f'(x) = \lim_{h\to 0} \frac{f(x+h)-f(x)}{h}",
    r"\left( \begin{array}{cc} a & b \\ c & d \end{array} \right)",
    r"a \\ b",
    r"\hat\alpha + \bar\beta + \vec x",
    r"$\alpha$ % trailing comment",
    r"\mathop{max}_{x} \medspace f(x)",
    r"\lparen x \rparen \lang y \rang",
    r"\operatorname*{argmin}_\theta L(\theta)",
    r"x_i^2 y''",
    r"\sqrt{\frac{1}{2}}",
    r"\cal A \subset \Bbb R",
]


class TestTokenizerParity:
    """The C++ and Python tokenizers must agree byte-for-byte."""

    @pytest.mark.parametrize("line", CORPUS)
    def test_native_matches_python(self, line):
        try:
            from doc2tex_tpu.native import latex_normalize
        except Exception:
            pytest.skip("native kernel not built")
        for mode in ("tokenize", "normalize"):
            assert latex_normalize(line, mode) == py_normalize(line, mode)


class TestNormalization:
    def test_subscript_bracing(self):
        assert py_normalize("x_i^2") == "x _ { i } ^ { 2 }"

    def test_frac_bracing(self):
        assert py_normalize(r"\frac12") == r"\frac { 1 } { 2 }"

    def test_font_switch(self):
        assert py_normalize(r"{\rm abc}") == r"\mathrm { a b c }"
        assert py_normalize(r"\cal A") == r"\mathcal { A }"

    def test_label_removed(self):
        assert "label" not in py_normalize(r"x \label{eq1} y")

    def test_prime(self):
        assert py_normalize("x'") == r"x ^ { \prime }"
        assert py_normalize("x''") == r"x ^ { \prime \prime }"

    def test_linebreak_flatten(self):
        assert py_normalize(r"a \\ b") == r"a \, b"
        # kept inside matrix envs
        out = py_normalize(r"\begin{matrix} a \\ b \end{matrix}")
        assert r"\\" in out

    def test_env_single_token(self):
        out = py_normalize(r"\begin{array}{cc} a \end{array}")
        assert out.startswith(r"\begin{array} { c c }")

    def test_spacing_rewrites(self):
        assert py_normalize(r"a \medspace b") == r"a \, b"
        assert py_normalize(r"\lparen x \rparen") == "( x )"

    def test_full_pipeline(self):
        out = normalize_formula(r"\sum_{i=1}^{N} x_i \quad = \; 1 + 2 + 3")
        assert out is not None and "sum" in out

    def test_skip_rules(self):
        assert normalize_formula(r"\genfrac{a}{b}{c}{d}{e}{f} + x + y") is None


INVALID_CORPUS = [
    # the lines katex.__parse would throw on (standardize_latex.js:39-42)
    r"x + y + z + w + \frac{1}",                      # missing 2nd arg (EOF)
    r"\begin{matrix} a + b \end{pmatrix} + c + d",    # env mismatch
    r"\begin{notanenv} x + y + z \end{notanenv}",     # unknown env
    r"{ x + y + z + w + v",                           # unclosed group
    r"x + y + z + w + v }",                           # stray close brace
    r"\left( x + y + z + w",                          # \left without \right
    r"\left x + y \right) + z + w",                   # invalid delimiter
    r"a \over b \over c + d + e",                     # double infix
    r"x + y \limits + z + w + v",                     # \limits after non-op
    r"\notacommand{x} + y + z + w",                   # unknown control seq
    r"\begin{matrix} a + b + c + d",                  # unterminated env
    r"\rule{abc}{1em} + x + y + z",                   # invalid size arg
]


class TestValidation:
    """KaTeX-grade parse gate: invalid formulas are dropped by
    normalize_file; every valid corpus line still normalizes identically
    with validation on (VERDICT round-1 item #2)."""

    @pytest.mark.parametrize("line", INVALID_CORPUS)
    def test_invalid_dropped(self, line):
        assert normalize_formula(line) is None
        from doc2tex_tpu.latex.normalize import normalize_file

        assert list(normalize_file([line])) == []

    @pytest.mark.parametrize("line", CORPUS)
    def test_valid_corpus_unchanged(self, line):
        from doc2tex_tpu.latex.validate import validate_formula
        from doc2tex_tpu.latex.normalize import prepass

        assert validate_formula(prepass(line)) is None, line
        # validation on == validation off for parsing lines
        assert normalize_formula(line) == normalize_formula(
            line, validate=False
        )

    def test_vendored_permissive_mode(self):
        # strict=False replicates the vendored parseSymbol fallthrough
        # (Parser.js:783-793): unknown commands are accepted as ords
        from doc2tex_tpu.latex.validate import validate_formula

        line = r"\notacommand{x} + y"
        assert validate_formula(line, strict=False) is None
        assert validate_formula(line, strict=True) is not None

    def test_native_python_agree(self):
        try:
            from doc2tex_tpu.native import latex_validate
        except Exception:
            pytest.skip("native kernel not built")
        from doc2tex_tpu.latex.validate import validate_formula

        for line in CORPUS + INVALID_CORPUS:
            for strict in (True, False):
                assert latex_validate(line, strict) == validate_formula(
                    line, strict
                ), (line, strict)


class TestValidationFuzz:
    def test_native_matches_python_on_soup(self):
        try:
            from doc2tex_tpu.native import latex_validate
        except Exception:
            pytest.skip("native kernel not built")
        from doc2tex_tpu.latex.validate import validate_formula

        rng = np.random.default_rng(13)
        pieces = [
            "x", "1", "{", "}", "^", "_", "\\frac", "\\sqrt", "\\alpha",
            "$", "'", "\\\\", "\\begin{matrix}", "\\end{matrix}", "[", "]",
            "\\left(", "\\right)", "\\rm", "\\label{x}", "&", "\\,", "#",
            "\\over", "\\limits", "\\begin{array}", "{cc}", "\\end{array}",
            "\\cr", "\\text", "\\rule", "\\unknowncmd", "\\sum", "\\big",
            "(", ")", "\\end", "\\begin", "\\right", "\\left",
        ]
        for _ in range(400):
            n = int(rng.integers(1, 25))
            s = " ".join(
                pieces[int(rng.integers(len(pieces)))] for _ in range(n)
            )
            for strict in (True, False):
                assert latex_validate(s, strict) == validate_formula(
                    s, strict
                ), (s, strict)


class TestGrammarValidatorLoop:
    """The synthetic grammars and the KaTeX-grade validator check each
    other (VERDICT r2 item #6): every generated label parses strict, is
    never dropped by the normalize pipeline, and survives it with an
    identical lexed token stream (tokenize mode only regroups super-tokens
    like ``\\begin{matrix}`` -> ``\\begin {matrix}``; content must not
    change).  Match: reference ``standardize_latex.js:39-42`` drop
    semantics."""

    def _check(self, labels):
        from doc2tex_tpu.latex import pytok
        from doc2tex_tpu.latex.normalize import normalize_formula
        from doc2tex_tpu.latex.validate import validate_formula

        for lb in labels:
            assert validate_formula(lb, strict=True) is None, lb
            if len(lb.split()) <= 5:
                continue  # normalize_formula drops <=MIN_TOKENS lines
            out = normalize_formula(lb, mode="tokenize", strict=True)
            assert out is not None, lb
            assert pytok.lex(out) == pytok.lex(lb), (lb, out)

    def test_structured_labels_validate(self):
        from doc2tex_tpu.data.synthetic import synth_structured_dataset

        _, labels = synth_structured_dataset(250, seed=11)
        self._check(labels)

    def test_hard_labels_validate(self):
        from doc2tex_tpu.data.synthetic import synth_hard_dataset

        _, labels = synth_hard_dataset(300, seed=12)
        self._check(labels)

    def test_long_labels_validate(self):
        # round-4 long multi-line arm (the reference eval contract's
        # 448x960 / len<=500 regime): same decodable-label contract
        from doc2tex_tpu.data.synthetic import hard_vocab, synth_long_dataset

        imgs, labels = synth_long_dataset(40, seed=13)
        self._check(labels)
        vocab = set(hard_vocab())
        lens = [len(lb.split()) for lb in labels]
        for img, lb in zip(imgs, labels):
            toks = lb.split()
            assert set(toks) <= vocab  # frozen vocab: fine-tunable weights
            assert toks[0] == "\\begin{matrix}" and toks[-1] == "\\end{matrix}"
            assert len(toks) <= 500
            assert img.shape[0] <= 448 and img.shape[1] <= 960
        assert max(lens) > 150  # actually exercises decode past the old cap

    def test_hard_vocab_reference_scale(self):
        # reference regime: UNK-thresholded vocabs are several hundred
        # tokens (generate_latex_vocab.py); ours draws from the generated
        # KaTeX inventory at that scale, deterministically
        from doc2tex_tpu.data.synthetic import hard_terminals, hard_vocab

        v = hard_vocab()
        assert len(v) >= 500
        assert v == hard_vocab()  # cached + deterministic
        assert len(set(v)) == len(v)
        assert set(hard_terminals()) <= set(v)

    def test_hard_dataset_fonts_noise_lengths(self):
        import numpy as np

        from doc2tex_tpu.data.synthetic import (
            _hard_glyph, synth_hard_dataset,
        )

        # >=3 distinct renderings per token
        g = [_hard_glyph(5, f) for f in range(3)]
        assert not np.array_equal(g[0], g[1])
        assert not np.array_equal(g[1], g[2])
        imgs, labels = synth_hard_dataset(
            60, seed=7, min_len=8, max_len=150
        )
        i2, l2 = synth_hard_dataset(60, seed=7, min_len=8, max_len=150)
        assert labels == l2  # deterministic incl. noise
        assert all(np.array_equal(a, b) for a, b in zip(imgs, i2))
        lens = [len(lb.split()) for lb in labels]
        assert min(lens) >= 8 and max(lens) <= 150
        # noise off is a different picture than noise on
        i3, _ = synth_hard_dataset(60, seed=7, min_len=8, max_len=150,
                                   noise=0.0)
        assert any(
            a.shape != b.shape or not np.array_equal(a, b)
            for a, b in zip(imgs, i3)
        )


class TestPostpass:
    def test_empty_bracket_removed(self):
        assert remove_redundant_bracket("a { } b".split()) == "a b"
        assert remove_redundant_bracket("{ x }".split()) == "{ x }"

    def test_whitespace_ladder(self):
        # 1->1, 2->2, 3->2, 4->4, >=8 -> 4  (reference STANDARD_SPACE)
        s3 = r"a \, \, \, b"
        assert standardize_whitespace(s3).split().count("\\,") == 2
        s9 = "a " + r"\, " * 9 + "b"
        assert standardize_whitespace(s9).split().count("\\,") == 4
        s1 = r"a \, b"
        assert standardize_whitespace(s1).split().count("\\,") == 1

    def test_array_flatten(self):
        s = r"\begin{array} { c } { x + y } \end{array}"
        assert remove_redundant_array_env(s) == "x + y"
        # arrays with row breaks are kept
        s2 = r"\begin{array} { c } { x } \\ { y } \end{array}"
        assert r"\begin{array}" in remove_redundant_array_env(s2)

    def test_bracket_balance(self):
        # reference inserts the missing partner adjacent to the orphan
        # (data_utils.py:368-396), then the result is balanced
        for s in ("(a))", "((a)", ")a(", "((("):
            out = Postprocessing.balance(s, "(", ")")
            assert out.count("(") == out.count(")")
        assert Postprocessing.balance("(a)", "(", ")") == "(a)"

    def test_remove_unused_whitespace(self):
        out = Postprocessing.remove_unused_whitespace("x ^ { 2 } + 1")
        assert out == "x^{2}+1"


class TestExtract:
    def test_find_dollar_math(self):
        doc = "text $$" + "x^2 + y^2 = z^2 + a + b + c + d" + "$$ more"
        out = find_math(doc)
        assert len(out) == 1 and "x^2" in out[0]

    def test_find_equation_env(self):
        doc = (
            r"\begin{equation} \int_0^\infty e^{-x^2} dx = "
            r"\frac{\sqrt{\pi}}{2} \end{equation}"
        )
        out = find_math(doc)
        assert len(out) == 1

    def test_unbalanced_rejected(self):
        doc = "$$ { x + y + z + w + v + u + t + s + r $$"
        assert find_math(doc) == []

    def test_graphic_rejected(self):
        doc = "$$ \\color{red} x + y + z + w + v + u + t $$"
        assert find_math(doc) == []


class TestDemacro:
    def test_newcommand_noargs(self):
        s = r"\newcommand{\R}{\mathbb{R}} f: \R \to \R"
        out = pydemacro(s)
        assert r"\mathbb{R}" in out and "newcommand" not in out

    def test_newcommand_args(self):
        s = r"\newcommand{\pd}[2]{\frac{\partial #1}{\partial #2}} \pd{f}{x}"
        out = pydemacro(s)
        assert r"\frac{\partial f}{\partial x}" in out

    def test_def(self):
        s = r"\def\eps{\varepsilon} \eps > 0"
        assert r"\varepsilon" in pydemacro(s)


class TestNativeLevenshtein:
    def test_matches_python(self):
        from doc2tex_tpu.eval.metrics import _lev_py

        try:
            from doc2tex_tpu.native import levenshtein
        except Exception:
            pytest.skip("native kernel not built")
        rng = np.random.default_rng(0)
        for _ in range(50):
            a = "".join(rng.choice(list("abcdef")) for _ in range(rng.integers(0, 20)))
            b = "".join(rng.choice(list("abcdef")) for _ in range(rng.integers(0, 20)))
            assert levenshtein(a, b) == _lev_py(a, b)

    def test_u64(self):
        from doc2tex_tpu.native import levenshtein_u64

        a = np.array([1, 2, 3, 4], np.uint64)
        b = np.array([1, 3, 4], np.uint64)
        assert levenshtein_u64(a, b) == 1


class TestTokenizerFuzz:
    def test_random_soup_never_crashes_and_agrees(self):
        """Random LaTeX-ish soup: native and Python tokenizers must not
        crash and must agree byte-for-byte."""
        try:
            from doc2tex_tpu.native import latex_normalize
        except Exception:
            pytest.skip("native kernel not built")
        rng = np.random.default_rng(7)
        pieces = [
            "x", "y", "1", "2", "{", "}", "^", "_", "\\frac", "\\sqrt",
            "\\alpha", "$", "%c", "'", "\\\\", "\\begin{matrix}",
            "\\end{matrix}", "[", "]", "\\left(", "\\right)", " ", "\\rm",
            "\\label{x}", "\\medspace", "&", "\\,", "#", "~", "\\",
        ]
        for _ in range(200):
            n = int(rng.integers(1, 30))
            s = " ".join(pieces[int(rng.integers(len(pieces)))] for _ in range(n))
            for mode in ("tokenize", "normalize"):
                a = latex_normalize(s, mode)
                b = py_normalize(s, mode)
                assert a == b, (s, mode, a, b)

    def test_long_input(self):
        try:
            from doc2tex_tpu.native import latex_normalize
        except Exception:
            pytest.skip("native kernel not built")
        s = ("x ^ 2 + " * 2000).strip("+ ")
        out = latex_normalize(s, "normalize")
        assert out == py_normalize(s, "normalize")
        assert len(out) > 10000  # exercised the buffer regrow path


class TestUnicodeParity:
    """UTF-8 codepoints must lex identically in C++ (bytes) and Python
    (str): one codepoint = one token."""

    CASES = [
        "α + β = γ", "x ∈ ℝ", "\\α test", "café ≤ ∞",
        "ψ(t) = ∫ φ dμ", "\\frac{α}{β}",
    ]

    @pytest.mark.parametrize("s", CASES)
    def test_native_matches_python(self, s):
        try:
            from doc2tex_tpu.native import latex_normalize, latex_validate
        except Exception:
            pytest.skip("native kernel not built")
        from doc2tex_tpu.latex.validate import validate_formula

        for mode in ("tokenize", "normalize"):
            assert latex_normalize(s, mode) == py_normalize(s, mode)
        for strict in (True, False):
            assert latex_validate(s, strict) == validate_formula(s, strict)

    def test_codepoint_not_split(self):
        from doc2tex_tpu.latex.pytok import lex

        assert lex("αβ") == ["α", "β"]
        try:
            from doc2tex_tpu.native import latex_normalize
        except Exception:
            pytest.skip("native kernel not built")
        assert latex_normalize("αβ", "tokenize") == "α β"


class TestMixedScriptLexing:
    def test_control_words_are_ascii_only(self):
        # KaTeX lexer regex \\[a-zA-Z]+ stops at non-ASCII; both twins must
        from doc2tex_tpu.latex.pytok import lex

        assert lex("\\aα") == ["\\a", "α"]
        try:
            from doc2tex_tpu.native import latex_normalize, latex_validate
        except Exception:
            pytest.skip("native kernel not built")
        from doc2tex_tpu.latex.validate import validate_formula

        s = "\\aα + x"
        for mode in ("tokenize", "normalize"):
            assert latex_normalize(s, mode) == py_normalize(s, mode)
        for strict in (True, False):
            assert latex_validate(s, strict) == validate_formula(s, strict)
