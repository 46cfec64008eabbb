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
#include <set>
#include <string>
#include <vector>

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
                toks.push_back(s.substr(i, 2));
                i += 2;
            } else {
                ++i;
            }
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
    if (mode == 0) {  // tokenize: raw lexer stream ($ and comments stripped)
        string out;
        for (const auto& t : toks) {
            if (t == "$") continue;
            if (!out.empty()) out += ' ';
            out += t;
        }
        return out;
    }
    Normalizer nrm(std::move(toks), flatten);
    return nrm.run();
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

}  // extern "C"
