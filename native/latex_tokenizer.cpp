// Canonical LaTeX tokenizer / normalizer (C ABI).
//
// TPU-native replacement for the reference's out-of-process Node.js KaTeX
// pipeline (doc2tex/tools/build_data/latex_processing/standardize_latex.js
// driving the vendored KaTeX parser): lex a math-mode LaTeX string into
// tokens and emit a canonical space-separated form in which every
// sub/superscript and command argument is explicitly braced — the same
// canonicalization the reference obtains from a KaTeX parse -> AST -> token
// emission round trip, scoped to the grammar the data pipeline exercises.
//
// Behavior replicated from standardize_latex.js:
//  - comment stripping, $ removal, \> and \~ to separators
//  - {\rm -> \mathrm{ family rewrites (rm/bf/sf/it/frak/tt/cal/Bbb)
//  - \lparen -> ( , \rparen -> ) , \lang -> \langle , \rang -> \rangle
//  - spacing commands (\medspace, \thickspace, \hfill, \negthinspace,
//    \negmedspace, \negthickspace, \mathstrut, \kern, \mkern) -> "\,"
//  - \label{...} removal
//  - \\ -> "\," when the formula contains no matrix/cases/array/begin
//  - digit/letter runs split into single-char tokens (KaTeX ord atoms)
//  - x^2  -> x ^ { 2 } ;  \frac12 -> \frac { 1 } { 2 } ;  x' -> x ^ { \prime }
//
// A byte-identical pure-Python fallback lives in doc2tex_tpu/latex/pytok.py;
// tests assert both implementations agree on a corpus.
//
// Build: g++ -O3 -shared -fPIC latex_tokenizer.cpp -o _doc2tex_native.so

#include <cstring>
#include <map>
#include <set>
#include <stdexcept>
#include <string>
#include <vector>

#include "katex_tables.h"

namespace {

using std::string;
using std::vector;

bool is_letter(char c) { return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'); }

// ---------------------------------------------------------------- lexer
vector<string> lex(const string& s) {
    vector<string> toks;
    size_t i = 0, n = s.size();
    while (i < n) {
        char c = s[i];
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { ++i; continue; }
        if (c == '%') {  // comment to EOL
            while (i < n && s[i] != '\n') ++i;
            continue;
        }
        if (c == '\\') {
            if (i + 1 < n && is_letter(s[i + 1])) {
                size_t j = i + 1;
                while (j < n && is_letter(s[j])) ++j;
                // KaTeX treats \operatorname* as one unit
                if (j < n && s[j] == '*') ++j;
                toks.push_back(s.substr(i, j - i));
                i = j;
            } else if (i + 1 < n) {
                size_t j = i + 2;  // backslash + one codepoint (UTF-8 aware)
                if (s[i + 1] & 0x80)
                    while (j < n && (s[j] & 0xC0) == 0x80) ++j;
                toks.push_back(s.substr(i, j - i));
                i = j;
            } else {
                ++i;
            }
            continue;
        }
        if (c & 0x80) {  // UTF-8 multibyte: one codepoint = one token,
            size_t j = i + 1;  // matching the Python twin's str semantics
            while (j < n && (s[j] & 0xC0) == 0x80) ++j;
            toks.push_back(s.substr(i, j - i));
            i = j;
            continue;
        }
        toks.push_back(string(1, c));
        ++i;
    }
    return toks;
}

// ------------------------------------------------------- normalization
const std::set<string> ARGS2 = {
    "\\frac",  "\\binom",  "\\cfrac", "\\dfrac", "\\tfrac", "\\dbinom",
    "\\tbinom", "\\overset", "\\underset", "\\stackrel", "\\sideset",
};
const std::set<string> ARGS1 = {
    "\\overline", "\\underline", "\\hat", "\\bar", "\\vec", "\\dot",
    "\\ddot", "\\dddot", "\\tilde", "\\widehat", "\\widetilde", "\\check",
    "\\breve", "\\acute", "\\grave", "\\mathring", "\\overbrace",
    "\\underbrace", "\\mathrm", "\\mathbf", "\\mathsf", "\\mathit",
    "\\mathtt", "\\mathcal", "\\mathbb", "\\mathfrak", "\\mathnormal",
    "\\mathscr", "\\operatorname", "\\operatorname*", "\\boldsymbol",
    "\\bm", "\\text", "\\mbox", "\\textrm", "\\textbf", "\\textit",
    "\\textsf", "\\texttt", "\\textnormal", "\\phantom", "\\hphantom",
    "\\vphantom", "\\not", "\\cancel", "\\overrightarrow",
    "\\overleftarrow", "\\underrightarrow", "\\underleftarrow", "\\pmb",
};
const std::set<string> OPT_ARG = {"\\sqrt", "\\xrightarrow", "\\xleftarrow"};
// old-style font switches rewritten to \mathX{...} groups
struct FontRewrite { const char* from; const char* to; };
const FontRewrite FONT_SWITCH[] = {
    {"\\rm", "\\mathrm"},   {"\\bf", "\\mathbf"},  {"\\sf", "\\mathsf"},
    {"\\it", "\\mathit"},   {"\\frak", "\\mathfrak"}, {"\\tt", "\\mathtt"},
    {"\\cal", "\\mathcal"}, {"\\Bbb", "\\mathbb"},
};
const std::set<string> SPACE_TO_COMMA = {
    "\\medspace", "\\thickspace", "\\hfill", "\\negthinspace",
    "\\negmedspace", "\\negthickspace", "\\mathstrut", "\\kern", "\\mkern",
};

const char* font_rewrite(const string& t) {
    for (const auto& f : FONT_SWITCH)
        if (t == f.from) return f.to;
    return nullptr;
}

class Normalizer {
  public:
    Normalizer(vector<string> toks, bool flatten_linebreaks)
        : toks_(std::move(toks)), flatten_(flatten_linebreaks) {}

    string run() {
        while (p_ < toks_.size()) parse_one(nullptr);
        string out;
        for (size_t k = 0; k < out_.size(); ++k) {
            if (k) out += ' ';
            out += out_[k];
        }
        return out;
    }

  private:
    vector<string> toks_;
    vector<string> out_;
    size_t p_ = 0;
    bool flatten_;

    const string* peek() const {
        return p_ < toks_.size() ? &toks_[p_] : nullptr;
    }
    string next() { return toks_[p_++]; }
    void emit(const string& t) { out_.push_back(t); }

    void skip_group() {  // consume { ... } without emitting
        const string* t = peek();
        if (!t || *t != "{") return;
        next();
        int depth = 1;
        while (p_ < toks_.size() && depth) {
            string u = next();
            if (u == "{") ++depth;
            else if (u == "}") --depth;
        }
    }

    // parse one item; if `stop` is non-null, "}" matching the caller's
    // group terminates via return code handled in parse_group.
    void parse_group() {  // at '{': emit { ... } with font-switch rewrite
        next();  // consume '{'
        // {\rm ... } -> \mathrm { ... }
        const string* t = peek();
        const char* fw = t ? font_rewrite(*t) : nullptr;
        if (fw) {
            next();
            emit(fw);
        }
        emit("{");
        while (p_ < toks_.size() && *peek() != "}") parse_one(nullptr);
        if (p_ < toks_.size()) next();  // consume '}'
        emit("}");
    }

    void parse_arg() {  // always emits a braced argument
        const string* t = peek();
        if (!t) { emit("{"); emit("}"); return; }
        if (*t == "{") { parse_group(); return; }
        emit("{");
        parse_one(nullptr);
        emit("}");
    }

    void parse_env_name(const string& cmd) {
        // \begin{name} -> single token "\begin{name}"
        const string* t = peek();
        if (t && *t == "{") {
            next();
            string name;
            while (p_ < toks_.size() && *peek() != "}") name += next();
            if (p_ < toks_.size()) next();
            emit(cmd + "{" + name + "}");
        } else {
            emit(cmd);
        }
    }

    void pass_optional() {  // copy [ ... ] verbatim if present
        const string* t = peek();
        if (!t || *t != "[") return;
        emit(next());  // '['
        while (p_ < toks_.size() && *peek() != "]") parse_one(nullptr);
        if (p_ < toks_.size()) { next(); emit("]"); }
    }

    void parse_one(const string*) {
        if (p_ >= toks_.size()) return;
        string t = next();

        if (t == "$") return;                      // strip math delimiters
        if (t == "\\>" || t == "\\~") return;      // explicit separators
        if (t == "\\label") { skip_group(); return; }
        if (t == "\\raisebox") { skip_group(); return; }
        if (t == "\\allowbreak" || t == "\\noalign" || t == "\\smallskip" ||
            t == "\\medskip" || t == "\\bigskip")
            return;
        if (SPACE_TO_COMMA.count(t)) { emit("\\,"); return; }
        if (t == "\\lparen") { emit("("); return; }
        if (t == "\\rparen") { emit(")"); return; }
        if (t == "\\lang") { emit("\\langle"); return; }
        if (t == "\\rang") { emit("\\rangle"); return; }
        if (t == "\\mathop") { emit("\\operatorname*"); parse_arg(); return; }
        if (t == "\\\\") { emit(flatten_ ? "\\," : "\\\\"); return; }

        if (t == "{") { --p_; parse_group(); return; }
        if (t == "}") { emit("}"); return; }  // unbalanced; keep

        if (t == "^" || t == "_") { emit(t); parse_arg(); return; }

        if (t == "'") {  // primes -> ^ { \prime ... }
            int count = 1;
            while (peek() && *peek() == "'") { next(); ++count; }
            emit("^");
            emit("{");
            for (int k = 0; k < count; ++k) emit("\\prime");
            emit("}");
            return;
        }

        if (t == "\\begin" || t == "\\end") { parse_env_name(t); return; }

        if (t == "\\left" || t == "\\right" || t == "\\big" || t == "\\Big" ||
            t == "\\bigg" || t == "\\Bigg" || t == "\\bigl" || t == "\\bigr" ||
            t == "\\Bigl" || t == "\\Bigr" || t == "\\biggl" || t == "\\biggr") {
            emit(t);
            if (peek()) emit(next());  // delimiter token verbatim
            return;
        }

        const char* fw = font_rewrite(t);
        if (fw) {  // \rm{x} or bare \rm switch: wrap rest of current group
            const string* u = peek();
            if (u && *u == "{") { emit(fw); parse_group(); }
            else {
                emit(fw); emit("{");
                while (p_ < toks_.size() && *peek() != "}") parse_one(nullptr);
                emit("}");
            }
            return;
        }

        if (OPT_ARG.count(t)) {
            emit(t);
            pass_optional();
            parse_arg();
            return;
        }
        if (ARGS2.count(t)) { emit(t); parse_arg(); parse_arg(); return; }
        if (ARGS1.count(t)) { emit(t); parse_arg(); return; }

        emit(t);
    }
};

string normalize_string(const string& input, int mode) {
    // \\ -> \, flattening applies when the formula has no multi-row envs
    bool flatten = input.find("matrix") == string::npos &&
                   input.find("cases") == string::npos &&
                   input.find("array") == string::npos &&
                   input.find("begin") == string::npos;
    vector<string> toks = lex(input);
    if (mode == 0) {
        // tokenize: lexer stream ($/comments stripped) with the reference's
        // parser-built env-name merge ("\begin { m a t r i x }" ->
        // "\begin {matrix}", Parser.js:434,458 global_str surgery)
        vector<string> merged;
        for (size_t i = 0; i < toks.size();) {
            const string& t = toks[i];
            if ((t == "\\begin" || t == "\\end") && i + 1 < toks.size() &&
                toks[i + 1] == "{") {
                size_t j = i + 2;
                string name;
                while (j < toks.size() && toks[j] != "}") name += toks[j++];
                if (j < toks.size()) {
                    merged.push_back(t);
                    merged.push_back("{" + name + "}");
                    i = j + 1;
                    continue;
                }
            }
            merged.push_back(t);
            ++i;
        }
        string out;
        for (const auto& t : merged) {
            if (t == "$") continue;
            if (!out.empty()) out += ' ';
            out += t;
        }
        return out;
    }
    Normalizer nrm(std::move(toks), flatten);
    return nrm.run();
}

// ------------------------------------------------------------ validation
//
// KaTeX-grade parse validation: a recursive-descent twin of the vendored
// KaTeX parser's LIVE error paths (reference standardize_latex.js:39-42
// runs katex.__parse in a try/catch; a ParseError drops the formula).
// Semantics and error strings are byte-identical to the Python twin in
// doc2tex_tpu/latex/validate.py — see that module's docstring for the
// enumerated error list and the strict-mode (upstream "Undefined control
// sequence") extension over the vendored permissive parseSymbol.

struct FuncSig { int num_args; int num_opt; int greediness; string arg_types; };

struct Tables {
    std::map<string, FuncSig> functions;       // vendored grammar
    std::map<string, FuncSig> extra_functions; // strict-mode pipeline extras
    std::set<string> symbols_math;
    std::set<string> symbols_math_op;
    std::set<string> symbols_text;
    std::set<string> extra_symbols;
    std::map<string, int> environments;
    std::set<string> delimiters;
    std::set<string> size_funcs;
    std::set<string> style_funcs;
    std::set<string> op_funcs;
    std::set<string> delim_funcs;

    Tables() {
        for (const auto& f : katex_tables::kFunctions)
            functions[f.name] = {f.num_args, f.num_opt, f.greediness,
                                 f.arg_types};
        for (const char* s : katex_tables::kSymbolsMath) symbols_math.insert(s);
        for (const char* s : katex_tables::kSymbolsMathOp)
            symbols_math_op.insert(s);
        for (const char* s : katex_tables::kSymbolsText) symbols_text.insert(s);
        for (const auto& e : katex_tables::kEnvironments)
            environments[e.name] = e.num_args;
        for (const char* s : katex_tables::kDelimiters) delimiters.insert(s);
        for (const char* s : katex_tables::kSizeFuncs) size_funcs.insert(s);
        for (const char* s : katex_tables::kStyleFuncs) style_funcs.insert(s);

        static const char* kOps[] = {
            "\\arcsin", "\\arccos", "\\arctan", "\\arg", "\\cos", "\\cosh",
            "\\cot", "\\coth", "\\csc", "\\deg", "\\dim", "\\exp", "\\hom",
            "\\ker", "\\lg", "\\ln", "\\log", "\\sec", "\\sin", "\\sinh",
            "\\tan", "\\tanh", "\\det", "\\gcd", "\\inf", "\\lim",
            "\\liminf", "\\limsup", "\\max", "\\min", "\\Pr", "\\sup",
            "\\int", "\\iint", "\\iiint", "\\oint", "\\coprod", "\\bigvee",
            "\\bigwedge", "\\biguplus", "\\bigcap", "\\bigcup", "\\intop",
            "\\prod", "\\sum", "\\bigotimes", "\\bigoplus", "\\bigodot",
            "\\bigsqcup", "\\smallint",
        };
        for (const char* s : kOps) op_funcs.insert(s);
        static const char* kDelimPre[] = {"\\big", "\\Big", "\\bigg",
                                          "\\Bigg"};
        static const char* kDelimSuf[] = {"", "l", "r", "m"};
        delim_funcs.insert("\\left");
        delim_funcs.insert("\\right");
        for (const char* p : kDelimPre)
            for (const char* s : kDelimSuf) delim_funcs.insert(string(p) + s);

        // strict-mode extras = this pipeline's own command tables that the
        // old vendored grammar lacks (mirrors validate.py EXTRA_*)
        for (const auto& c : ARGS2)
            if (!functions.count(c)) extra_functions[c] = {2, 0, 2, ""};
        for (const auto& c : ARGS1)
            if (!functions.count(c) && !symbols_math.count(c))
                extra_functions[c] = {1, 0, 2, ""};
        for (const auto& c : OPT_ARG)
            if (!functions.count(c)) extra_functions[c] = {1, 1, 2, ""};
        for (const auto& c : SPACE_TO_COMMA)
            if (!symbols_math.count(c)) extra_symbols.insert(c);
        for (const auto& f : FONT_SWITCH)
            if (!functions.count(f.from)) extra_symbols.insert(f.from);
        static const char* kDropCmds[] = {"\\allowbreak", "\\noalign",
                                          "\\smallskip", "\\medskip",
                                          "\\bigskip"};
        for (const char* c : kDropCmds)
            if (!symbols_math.count(c)) extra_symbols.insert(c);
        static const char* kMiscExtra[] = {
            "\\lparen", "\\rparen", "\\lang", "\\rang", "\\operatorname",
            "\\operatorname*", "\\notag", "\\hdashline", "\\limits",
            "\\nolimits", "\\prime",
        };
        for (const char* c : kMiscExtra) extra_symbols.insert(c);
    }
};

const Tables& tables() {
    static const Tables t;
    return t;
}

struct Invalid : std::runtime_error {
    explicit Invalid(const string& m) : std::runtime_error(m) {}
};

bool is_size_str(const string& in) {
    // Lexer.js sizeRegex: (-?)\s*(\d+(\.\d*)?|\.\d+)\s*([a-z]{2})
    size_t i = 0, n = in.size();
    auto skip_ws = [&] { while (i < n && (in[i] == ' ' || in[i] == '\t')) ++i; };
    skip_ws();
    if (i < n && in[i] == '-') { ++i; skip_ws(); }
    bool digit = false;
    while (i < n && in[i] >= '0' && in[i] <= '9') { ++i; digit = true; }
    if (i < n && in[i] == '.') {
        ++i;
        while (i < n && in[i] >= '0' && in[i] <= '9') { ++i; digit = true; }
    }
    if (!digit) return false;
    skip_ws();
    size_t rest = 0;
    while (i < n) {
        if (in[i] < 'a' || in[i] > 'z') return false;
        ++i; ++rest;
    }
    return rest == 2;
}

bool in_end_expr(const string& t) {
    return t == "}" || t == "\\end" || t == "\\right" || t == "&" ||
           t == "\\\\" || t == "\\cr";
}

class Validator {
  public:
    Validator(vector<string> toks, bool strict)
        : toks_(std::move(toks)), strict_(strict) {}

    void validate() {
        parse_expression(nullptr);
        if (p_ < toks_.size())
            err("Expected 'EOF', got '" + toks_[p_] + "'");
    }

  private:
    enum Kind { kNone, kOrd, kOp, kFunc };
    struct Atom { Kind kind; string name; };

    vector<string> toks_;
    size_t p_ = 0;
    bool strict_;
    bool text_mode_ = false;

    [[noreturn]] void err(const string& m) { throw Invalid(m); }

    const string* peek() const {
        return p_ < toks_.size() ? &toks_[p_] : nullptr;
    }
    string advance() { return toks_[p_++]; }

    void expect(const string& text) {
        const string* t = peek();
        if (!t || *t != text)
            err("Expected '" + text + "', got '" + (t ? *t : "EOF") + "'");
        advance();
    }

    const FuncSig* func_info(const string& name) const {
        auto it = tables().functions.find(name);
        if (it != tables().functions.end()) return &it->second;
        if (strict_) {
            auto jt = tables().extra_functions.find(name);
            if (jt != tables().extra_functions.end()) return &jt->second;
        }
        return nullptr;
    }

    void parse_expression(const string* break_tok) {
        int infix = 0;
        while (true) {
            const string* t = peek();
            if (!t || in_end_expr(*t)) return;
            if (break_tok && *t == *break_tok) return;
            size_t start = p_;
            if (parse_atom()) {
                if (++infix > 1) err("only one infix operator per group");
            }
            if (p_ == start) return;  // no progress (EOF inside atom)
        }
    }

    bool parse_atom() {
        Atom base = parse_implicit_group();
        if (base.kind == kNone) return false;
        while (true) {
            const string* t = peek();
            if (!t) break;
            if (*t == "\\limits" || *t == "\\nolimits") {
                if (base.kind != kOp)
                    err("Limit controls must follow a math operator");
                advance();
            } else if (*t == "^" || *t == "_") {
                const char* which =
                    (*t == "^") ? "superscript" : "subscript";
                advance();
                Atom g = parse_group();
                if (g.kind == kFunc) {
                    const FuncSig* info = func_info(g.name);
                    int greed = info ? info->greediness : 1;
                    if (greed > 1)
                        parse_function_args(g.name);
                    else
                        err("Got function '" + g.name +
                            "' with no arguments as " + which);
                }
            } else if (*t == "'") {
                advance();
                while (peek() && *peek() == "'") advance();
            } else {
                break;
            }
        }
        return base.kind == kFunc &&
               (base.name == "\\over" || base.name == "\\choose");
    }

    Atom parse_implicit_group() {
        Atom s = parse_symbol();
        if (s.kind == kNone) {
            const string* t = peek();
            if (t && *t == "{") {
                advance();
                parse_expression(nullptr);
                expect("}");
                return {kOrd, ""};
            }
            return {kNone, ""};
        }
        if (s.kind != kFunc) return s;

        const string& f = s.name;
        if (f == "\\left") {
            check_delim(f);
            parse_expression(nullptr);
            const string* t = peek();
            if (!t || *t != "\\right")
                err("Expected '\\right', got '" + (t ? *t : "EOF") + "'");
            advance();
            check_delim("\\right");
            return {kOrd, ""};
        }
        if (f == "\\begin") {
            string name = parse_env_name(f);
            auto it = tables().environments.find(name);
            if (it == tables().environments.end())
                err("No such environment: " + name);
            for (int i = 0; i < it->second; ++i) {
                Atom g = parse_group();
                if (g.kind == kNone)
                    err("Expected group after '\\begin{" + name + "}'");
            }
            parse_array_body();
            const string* t = peek();
            if (!t || *t != "\\end")
                err("Expected '\\end', got '" + (t ? *t : "EOF") + "'");
            advance();
            string ename = parse_env_name("\\end");
            if (ename != name)
                err("Mismatch: \\begin{" + name + "} matched by \\end{" +
                    ename + "}");
            return {kOrd, ""};
        }
        if (tables().size_funcs.count(f) || tables().style_funcs.count(f)) {
            parse_expression(nullptr);
            return {kOrd, ""};
        }
        parse_function_args(f);
        if (tables().op_funcs.count(f)) return {kOp, ""};
        return s;
    }

    void parse_array_body() {
        while (true) {
            parse_expression(nullptr);
            const string* t = peek();
            if (t && *t == "&") {
                advance();
            } else if (t && (*t == "\\end" || *t == "}")) {
                return;
            } else if (t && (*t == "\\\\" || *t == "\\cr")) {
                advance();
                if (peek() && *peek() == "[") {
                    advance();
                    lex_size_until("]");
                }
            } else {
                err("Expected & or \\\\ or \\end");
            }
        }
    }

    string parse_env_name(const string& cmd) {
        const string* t = peek();
        if (!t || *t != "{") err("Expected group after '" + cmd + "'");
        advance();
        string name;
        while (peek() && *peek() != "}") name += advance();
        expect("}");
        return name;
    }

    void lex_size_until(const string& close) {
        string body;
        while (peek() && *peek() != close) body += advance();
        expect(close);
        if (!is_size_str(body)) err("Invalid size: '" + body + "'");
    }

    void lex_color_until(const string& close) {
        string body;
        while (peek() && *peek() != close) body += advance();
        expect(close);
        auto alnum = [](char c) {
            return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
                   (c >= 'A' && c <= 'Z');
        };
        bool ok = !body.empty();
        size_t start = 0;
        if (ok && body[0] == '#') { start = 1; ok = body.size() > 1; }
        for (size_t k = start; ok && k < body.size(); ++k)
            if (!alnum(body[k])) ok = false;
        if (!ok) err("Invalid color: '" + body + "'");
    }

    string arg_type_at(const FuncSig& sig, int idx) const {
        // arg_types is comma-joined; empty -> all "original"
        if (sig.arg_types.empty()) return "";
        int cur = 0;
        size_t pos = 0;
        while (cur < idx) {
            size_t c = sig.arg_types.find(',', pos);
            if (c == string::npos) return "";
            pos = c + 1;
            ++cur;
        }
        size_t c = sig.arg_types.find(',', pos);
        return sig.arg_types.substr(
            pos, c == string::npos ? string::npos : c - pos);
    }

    void parse_function_args(const string& f) {
        const FuncSig* info = func_info(f);
        if (!info) return;
        for (int i = 0; i < info->num_opt; ++i) {
            string at = arg_type_at(*info, i);
            if (!peek() || *peek() != "[") continue;
            advance();
            if (at == "size") {
                lex_size_until("]");
            } else if (at == "color") {
                lex_color_until("]");
            } else {
                string close = "]";
                parse_expression(&close);
                expect("]");
            }
        }
        if (tables().delim_funcs.count(f)) {
            check_delim(f);
            return;
        }
        for (int i = 0; i < info->num_args; ++i) {
            string at = arg_type_at(*info, info->num_opt + i);
            if (at == "size" || at == "color") {
                expect("{");
                if (at == "size")
                    lex_size_until("}");
                else
                    lex_color_until("}");
            } else if (at == "text") {
                bool old = text_mode_;
                text_mode_ = true;
                Atom g = parse_group();
                text_mode_ = old;
                if (g.kind == kNone)
                    err("Expected group after '" + f + "'");
            } else {
                Atom g = parse_group();
                if (g.kind == kNone)
                    err("Expected group after '" + f + "'");
                if (g.kind == kFunc) {
                    const FuncSig* ginfo = func_info(g.name);
                    int ggreed = ginfo ? ginfo->greediness : 1;
                    if (ggreed > info->greediness)
                        parse_function_args(g.name);
                    // else: permissive (vendored commented-out throw)
                }
            }
        }
    }

    void check_delim(const string& f) {
        const string* t = peek();
        if (!t) err("Expected group after '" + f + "'");
        if (*t == "{") {
            advance();
            parse_expression(nullptr);
            expect("}");
            err("Invalid delimiter: group after '" + f + "'");
        }
        string d = advance();
        if (!tables().delimiters.count(d))
            err("Invalid delimiter: '" + d + "' after '" + f + "'");
    }

    Atom parse_group() {
        const string* t = peek();
        if (t && *t == "{") {
            advance();
            parse_expression(nullptr);
            expect("}");
            return {kOrd, ""};
        }
        return parse_symbol();
    }

    Atom parse_symbol() {
        const string* tp = peek();
        if (!tp || *tp == "{") return {kNone, ""};
        const string& t = *tp;
        if (in_end_expr(t)) {
            // "}" in argument position: the vendored parseSymbol consumes
            // it as an ord (modified else-branch)
            if (t == "}") {
                advance();
                return {kOrd, ""};
            }
            return {kNone, ""};
        }
        const auto& tb = tables();
        if (tb.functions.count(t)) {
            advance();
            return {kFunc, t};
        }
        const auto& symtab = text_mode_ ? tb.symbols_text : tb.symbols_math;
        if (symtab.count(t)) {
            advance();
            bool op = !text_mode_ && tb.symbols_math_op.count(t);
            return {op ? kOp : kOrd, ""};
        }
        if (strict_) {
            if (tb.extra_functions.count(t)) {
                advance();
                return {kFunc, t};
            }
            if (tb.extra_symbols.count(t)) {
                advance();
                return {kOrd, ""};
            }
            if (t.size() > 1 && t[0] == '\\')
                err("Undefined control sequence: " + t);
        }
        advance();
        return {kOrd, ""};
    }
};

// The JS driver's pre-parse rewrites (standardize_latex.js:13-31) at token
// level: drop $/\>/\~, strip \label{...} and \raisebox{...}, flatten
// \\ -> \, outside multi-row formulas.  Mirrors validate.py _pre_skip.
vector<string> pre_skip(const vector<string>& toks, bool flatten) {
    vector<string> out;
    size_t i = 0, n = toks.size();
    while (i < n) {
        const string& t = toks[i];
        if (t == "$" || t == "\\>" || t == "\\~") { ++i; continue; }
        if (t == "\\label" || t == "\\raisebox") {
            ++i;
            if (i < n && toks[i] == "{") {
                int depth = 1;
                ++i;
                while (i < n && depth) {
                    if (toks[i] == "{") ++depth;
                    else if (toks[i] == "}") --depth;
                    ++i;
                }
            }
            continue;
        }
        if (flatten && t == "\\\\") { out.push_back("\\,"); ++i; continue; }
        out.push_back(t);
        ++i;
    }
    return out;
}

// Returns "" when valid, else the error message.
string validate_string(const string& input, bool strict) {
    bool flatten = input.find("matrix") == string::npos &&
                   input.find("cases") == string::npos &&
                   input.find("array") == string::npos &&
                   input.find("begin") == string::npos;
    vector<string> toks = pre_skip(lex(input), flatten);
    try {
        Validator(std::move(toks), strict).validate();
        return "";
    } catch (const Invalid& e) {
        return e.what();
    }
}

}  // namespace

extern "C" {

// Returns the number of bytes written (excl. NUL), or -(needed) if outcap
// is too small.  mode: 0 = tokenize, 1 = normalize.
int d2t_latex_normalize(const char* in, int mode, char* out, int outcap) {
    string result = normalize_string(string(in), mode);
    int need = static_cast<int>(result.size());
    if (need + 1 > outcap) return -(need + 1);
    std::memcpy(out, result.c_str(), need + 1);
    return need;
}

// KaTeX-grade parse validation.  Returns 0 when the formula parses; when
// invalid, returns the error-message length (>0) and writes the message to
// out, or -(needed) if outcap is too small.  strict != 0 additionally
// rejects control sequences unknown to the grammar + pipeline tables.
int d2t_latex_validate(const char* in, int strict, char* out, int outcap) {
    string msg = validate_string(string(in), strict != 0);
    if (msg.empty()) {
        if (outcap > 0) out[0] = '\0';
        return 0;
    }
    int need = static_cast<int>(msg.size());
    if (need + 1 > outcap) return -(need + 1);
    std::memcpy(out, msg.c_str(), need + 1);
    return need;
}

}  // extern "C"
