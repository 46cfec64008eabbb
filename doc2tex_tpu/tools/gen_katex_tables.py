"""Generate the KaTeX command-inventory tables from the vendored grammar.

Reads the reference's vendored KaTeX sources (read-only at
``/root/reference/doc2tex/tools/build_data/latex_processing/third_party/
katex/src/``) and emits two generated artifacts:

- ``doc2tex_tpu/latex/_katex_tables.py``  (data-only Python module)
- ``native/katex_tables.h``               (C++ header with sorted tables)

Extracted surfaces (reference file:line):
- ``symbols.js``: every ``defineSymbol(mode, font, group, replace, name)``
  call plus the programmatic letter/digit/punct loops at the file tail —
  the per-mode symbol inventory and each symbol's group (``op`` matters
  for ``\\limits`` validation, Parser.js:322-327).
- ``functions.js``: every ``defineFunction(names, props, handler)`` call —
  name -> (numArgs, numOptionalArgs, argTypes, greediness); plus the
  ``delimiters`` array (the live "Invalid delimiter" throw,
  functions.js:347-350) and the sizing/styling no-handler groups.
- ``environments.js``: every ``defineEnvironment(names, props, handler)``
  — env name -> numArgs (the live "No such environment" throw,
  Parser.js:437-438).

Run: ``python -m doc2tex_tpu.tools.gen_katex_tables`` (regenerates both
outputs; they are checked in so the framework works without the reference
mounted).
"""

from __future__ import annotations

import json
import os
import re

KATEX_SRC = (
    "/root/reference/doc2tex/tools/build_data/latex_processing/"
    "third_party/katex/src"
)
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PY_OUT = os.path.join(REPO, "doc2tex_tpu", "latex", "_katex_tables.py")
H_OUT = os.path.join(REPO, "native", "katex_tables.h")

_JS_STR = r'"((?:[^"\\]|\\.)*)"'


def _unescape(s: str) -> str:
    """Decode a JS double-quoted string body (\\uXXXX, \\\\, \\")."""
    return json.loads('"' + s + '"')


def parse_symbols(src: str):
    """-> {mode: {name: group}} from defineSymbol calls + tail loops."""
    out = {"math": {}, "text": {}}
    call = re.compile(
        r"defineSymbol\(\s*(\w+),\s*(\w+),\s*(\w+),\s*"
        rf"(?:{_JS_STR}|null|(\w+)),\s*(?:{_JS_STR}|(\w+))\s*\)"
    )
    for m in call.finditer(src):
        mode, _font, group = m.group(1), m.group(2), m.group(3)
        name = m.group(5) if m.group(5) is not None else m.group(6)
        if name is None or mode not in out:
            # programmatic call inside a loop (name is a variable `ch`)
            continue
        out[mode][_unescape(name)] = group
    # the three tail loops (symbols.js: mathTextSymbols/textSymbols/letters)
    for ch in '0123456789/@."':
        out["math"][ch] = "textord"
    for ch in "0123456789`!@*()-=+[]'\";:?/.,":
        out["text"][ch] = "textord"
    for ch in (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ):
        out["math"][ch] = "mathord"
        out["text"][ch] = "textord"
    return out


def _parse_names(blob: str) -> list[str]:
    return [_unescape(m.group(1)) for m in re.finditer(_JS_STR, blob)]


def _split_calls(src: str, fname: str):
    """Yield (names_blob, props_blob) for each define*(...) call."""
    pat = re.compile(rf"{fname}\(")
    for m in pat.finditer(src):
        i = m.end()
        # names: either "..." or [ ... ]
        while src[i] in " \n\t":
            i += 1
        if src[i] == "[":
            j = src.index("]", i)
            names_blob = src[i : j + 1]
            i = j + 1
        elif src[i] == '"':
            j = i + 1
            while src[j] != '"' or src[j - 1] == "\\":
                j += 1
            names_blob = src[i : j + 1]
            i = j + 1
        else:  # `function defineFunction(` definition itself
            continue
        while src[i] in " \n\t,":
            i += 1
        # props: object literal, bare number, or identifier
        if src[i] == "{":
            depth, j = 1, i + 1
            while depth:
                if src[j] == "{":
                    depth += 1
                elif src[j] == "}":
                    depth -= 1
                j += 1
            props_blob = src[i:j]
        else:
            j = i
            while src[j] not in ",)":
                j += 1
            props_blob = src[i:j]
        yield names_blob, props_blob


def _prop_int(props: str, key: str, default: int) -> int:
    m = re.search(rf"{key}\s*:\s*(\d+)", props)
    return int(m.group(1)) if m else default


def parse_functions(src: str):
    """-> {name: (numArgs, numOptArgs, argTypes, greediness)}"""
    out = {}
    for names_blob, props in _split_calls(src, "defineFunction"):
        names = _parse_names(names_blob)
        if props.strip().isdigit():
            num_args, num_opt, arg_types, greed = int(props.strip()), 0, [], 1
        else:
            num_args = _prop_int(props, "numArgs", 0)
            num_opt = _prop_int(props, "numOptionalArgs", 0)
            greed = _prop_int(props, "greediness", 1)
            tm = re.search(r"argTypes\s*:\s*\[([^\]]*)\]", props)
            arg_types = _parse_names(tm.group(1)) if tm else []
        for n in names:
            out[n] = (num_args, num_opt, arg_types, greed)
    return out


def parse_environments(src: str):
    """-> {env_name: numArgs}"""
    out = {}
    for names_blob, props in _split_calls(src, "defineEnvironment"):
        for n in _parse_names(names_blob):
            out[n] = _prop_int(props, "numArgs", 0)
    return out


def parse_delimiters(src: str) -> list[str]:
    m = re.search(r"var delimiters = \[(.*?)\];", src, re.S)
    return _parse_names(m.group(1))


def parse_implicit_groups(src: str):
    """sizeFuncs + styleFuncs from Parser.js (implicit-group commands)."""
    size = re.search(r"var sizeFuncs = \[(.*?)\];", src, re.S)
    style = re.search(r"var styleFuncs = \[(.*?)\];", src, re.S)
    return _parse_names(size.group(1)), _parse_names(style.group(1))


def generate() -> None:
    with open(os.path.join(KATEX_SRC, "symbols.js")) as f:
        symbols = parse_symbols(f.read())
    with open(os.path.join(KATEX_SRC, "functions.js")) as f:
        fsrc = f.read()
    functions = parse_functions(fsrc)
    delimiters = parse_delimiters(fsrc)
    with open(os.path.join(KATEX_SRC, "environments.js")) as f:
        environments = parse_environments(f.read())
    with open(os.path.join(KATEX_SRC, "Parser.js")) as f:
        size_funcs, style_funcs = parse_implicit_groups(f.read())

    _write_python(symbols, functions, environments, delimiters,
                  size_funcs, style_funcs)
    _write_header(symbols, functions, environments, delimiters,
                  size_funcs, style_funcs)
    print(
        f"math symbols={len(symbols['math'])} text={len(symbols['text'])} "
        f"functions={len(functions)} envs={len(environments)} "
        f"delims={len(delimiters)}"
    )


def _write_python(symbols, functions, environments, delimiters,
                  size_funcs, style_funcs) -> None:
    lines = [
        '"""GENERATED by doc2tex_tpu/tools/gen_katex_tables.py — do not edit.',
        "",
        "Command inventory of the reference's vendored KaTeX grammar",
        "(third_party/katex/src/{symbols,functions,environments}.js).",
        '"""',
        "",
        "# name -> (num_args, num_optional_args, arg_types, greediness)",
        "FUNCTIONS = {",
    ]
    for name in sorted(functions):
        na, no, at, gr = functions[name]
        lines.append(f"    {name!r}: ({na}, {no}, {tuple(at)!r}, {gr}),")
    lines.append("}")
    for mode in ("math", "text"):
        lines.append("")
        lines.append(f"SYMBOLS_{mode.upper()} = {{")
        for name in sorted(symbols[mode]):
            lines.append(f"    {name!r}: {symbols[mode][name]!r},")
        lines.append("}")
    lines += [
        "",
        "ENVIRONMENTS = {",
        *[f"    {n!r}: {a}," for n, a in sorted(environments.items())],
        "}",
        "",
        f"DELIMITERS = frozenset({sorted(delimiters)!r})",
        "",
        f"SIZE_FUNCS = frozenset({sorted(size_funcs)!r})",
        "",
        f"STYLE_FUNCS = frozenset({sorted(style_funcs)!r})",
        "",
    ]
    with open(PY_OUT, "w") as f:
        f.write("\n".join(lines))


def _cstr(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    return '"' + out + '"'


def _write_header(symbols, functions, environments, delimiters,
                  size_funcs, style_funcs) -> None:
    lines = [
        "// GENERATED by doc2tex_tpu/tools/gen_katex_tables.py — do not edit.",
        "// Command inventory of the reference's vendored KaTeX grammar.",
        "#pragma once",
        "#include <cstdint>",
        "",
        "namespace katex_tables {",
        "",
        "struct FuncInfo {",
        "  const char* name;",
        "  int num_args;",
        "  int num_opt;",
        "  int greediness;",
        "  const char* arg_types;  // comma-joined, empty = all original",
        "};",
        "",
        "// sorted by name (binary-searchable)",
        "inline constexpr FuncInfo kFunctions[] = {",
    ]
    for name in sorted(functions):
        na, no, at, gr = functions[name]
        lines.append(
            f"  {{{_cstr(name)}, {na}, {no}, {gr}, {_cstr(','.join(at))}}},"
        )
    lines.append("};")

    def table(cname, names):
        lines.append("")
        lines.append(f"inline constexpr const char* {cname}[] = {{")
        for n in sorted(names):
            lines.append(f"  {_cstr(n)},")
        lines.append("};")

    # symbols: name + group op-flag matters; encode op symbols separately
    table("kSymbolsMath", symbols["math"].keys())
    table(
        "kSymbolsMathOp",
        [n for n, g in symbols["math"].items() if g == "op"],
    )
    table("kSymbolsText", symbols["text"].keys())
    lines += [
        "",
        "struct EnvInfo { const char* name; int num_args; };",
        "inline constexpr EnvInfo kEnvironments[] = {",
        *[
            f"  {{{_cstr(n)}, {a}}},"
            for n, a in sorted(environments.items())
        ],
        "};",
    ]
    table("kDelimiters", delimiters)
    table("kSizeFuncs", size_funcs)
    table("kStyleFuncs", style_funcs)
    lines += ["", "}  // namespace katex_tables", ""]
    with open(H_OUT, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    generate()
