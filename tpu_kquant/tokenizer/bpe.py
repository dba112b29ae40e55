"""Byte-level BPE tokenizer (gpt2-style; llama-3 / qwen2 GGUF vocabs).

Rank-ordered pair merging over the GGUF-embedded ``tokenizer.ggml.merges``
list, with the gpt2 byte<->unicode mapping so every byte sequence tokenizes.
Pre-tokenization uses the EXACT per-family splitter regex (selected by the
GGUF ``tokenizer.ggml.pre`` key, mirroring llama.cpp's
LLAMA_VOCAB_PRE_TYPE dispatch) via the ``regex`` module's \\p classes; a
unicodedata-based approximation remains as fallback for environments
without ``regex``.
"""

from __future__ import annotations

import unicodedata

try:
    import regex as _regex
except ImportError:  # pragma: no cover
    _regex = None

# the canonical pre-tokenizer patterns (llama.cpp llama-vocab.cpp /
# the models' tokenizer.json "Split" pre-tokenizers)
PRE_PATTERNS: dict[str, str] = {
    "llama3": (
        r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
        r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
    ),
    "gpt2": (
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
        r"|\s+(?!\S)|\s+"
    ),
    "qwen2": (
        r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}"
        r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
    ),
}
PRE_ALIASES = {"llama-bpe": "llama3", "llama-v3": "llama3", "default": "llama3",
               "gpt-2": "gpt2", "qwen2.5": "qwen2"}
_PRE_COMPILED: dict[str, "object"] = {}


def _compiled(pre: str):
    pat = _PRE_COMPILED.get(pre)
    if pat is None and _regex is not None:
        pat = _regex.compile(PRE_PATTERNS[pre])
        _PRE_COMPILED[pre] = pat
    return pat


def bytes_to_unicode() -> dict[int, str]:
    """gpt2's reversible byte -> printable-unicode mapping."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


def _is_letter(c: str) -> bool:
    return unicodedata.category(c).startswith("L")


def _is_digit(c: str) -> bool:
    return unicodedata.category(c).startswith("Nd")


def pretokenize(text: str, pre: str = "llama3") -> list[str]:
    """Split ``text`` with the EXACT pre-tokenizer regex of family ``pre``
    (llama3 / gpt2 / qwen2). Falls back to a unicodedata approximation of
    the llama-3 splitter when the ``regex`` module is unavailable."""
    pre = PRE_ALIASES.get(pre, pre)
    if pre not in PRE_PATTERNS:
        pre = "llama3"
    pat = _compiled(pre)
    if pat is not None:
        return pat.findall(text)
    return _pretokenize_approx(text)


def _pretokenize_approx(text: str) -> list[str]:
    """Approximation of the llama-3 regex splitter: contractions, letter
    runs (with one optional leading non-alnum-space char), 1-3 digit runs,
    punctuation runs, whitespace handling."""
    out: list[str] = []
    i, n = 0, len(text)
    contractions = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    while i < n:
        c = text[i]
        # contraction
        if c == "'":
            low = text[i : i + 4].lower()
            hit = next((s for s in contractions if low.startswith(s)), None)
            if hit:
                out.append(text[i : i + len(hit)])
                i += len(hit)
                continue
        # whitespace run (trailing space attaches to next word)
        if c.isspace():
            j = i
            while j < n and text[j].isspace():
                j += 1
            # newlines and multiple spaces group; last space joins next token
            if j < n and not text[j].isspace() and text[j - 1] == " " and (_is_letter(text[j]) or _is_digit(text[j])):
                if j - 1 > i:
                    out.append(text[i : j - 1])
                i = j - 1
                c = text[i]
            else:
                out.append(text[i:j])
                i = j
                continue
        # optional single space + letters
        if c == " " and i + 1 < n and _is_letter(text[i + 1]):
            j = i + 1
            while j < n and _is_letter(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if _is_letter(c):
            j = i
            while j < n and _is_letter(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if _is_digit(c):
            j = i
            while j < n and _is_digit(text[j]) and j - i < 3:
                j += 1
            out.append(text[i:j])
            i = j
            continue
        # punctuation / other run (optionally leading space)
        j = i + 1 if c != " " else i + 1
        while j < n and not text[j].isspace() and not _is_letter(text[j]) and not _is_digit(text[j]):
            j += 1
        out.append(text[i:j])
        i = j
    return [t for t in out if t]


class BPETokenizer:
    def __init__(
        self,
        tokens: list[str],
        merges: list[str],
        bos_id: int | None = None,
        eos_id: int | None = None,
        special_ids: set[int] | None = None,
        pre: str = "llama3",
    ):
        self.pre = pre
        self.tokens = tokens
        self.piece_to_id = {t: i for i, t in enumerate(tokens)}
        self.ranks: dict[tuple[str, str], int] = {}
        for r, m in enumerate(merges):
            a, _, b = m.partition(" ")
            self.ranks[(a, b)] = r
        self.bos_id, self.eos_id = bos_id, eos_id
        self.special_ids = special_ids or set()

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    def _bpe(self, word: str) -> list[str]:
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best : best + 2] = [parts[best] + parts[best + 1]]
        return parts

    def encode(self, text: str, add_bos: bool = True, add_eos: bool = False) -> list[int]:
        ids: list[int] = [self.bos_id] if (add_bos and self.bos_id is not None) else []
        for chunk in pretokenize(text, self.pre):
            mapped = "".join(_B2U[b] for b in chunk.encode("utf-8"))
            for piece in self._bpe(mapped):
                tid = self.piece_to_id.get(piece)
                if tid is None:
                    for ch in piece:  # per-char fallback
                        t2 = self.piece_to_id.get(ch)
                        if t2 is not None:
                            ids.append(t2)
                else:
                    ids.append(tid)
        if add_eos and self.eos_id is not None:
            ids.append(self.eos_id)
        return ids

    def decode(self, ids: list[int]) -> str:
        buf = bytearray()
        for tid in ids:
            if tid in self.special_ids:
                continue
            for ch in self.tokens[tid]:
                b = _U2B.get(ch)
                if b is not None:
                    buf.append(b)
                else:
                    buf.extend(ch.encode("utf-8"))
        return buf.decode("utf-8", errors="replace")
