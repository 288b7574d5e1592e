"""POS-tag machinery: tagger model, tag-mask patterns, grammar matching.

Reference parity map (code/functions/language-processing/java/nu/marginalia/
language/pos/ and third-party/rdrpostagger/):

- ``PosTagger``      — pos/PosTagger.java: distinct-tag registry in
  first-appearance order, one bit per tag id, encode/decode, prefix ids.
- ``PosPattern``     — pos/PosPattern.java ported loop-for-loop:
  ``match_sentence`` (the comma-window rule with the ``i = nextCommaPos``
  skip), ``is_match``, ``match_tag_pattern``; every PosPatternTest.java
  vector is transcribed in tests/test_pos.py.
- pattern parsing    — pos/PosPattern.java PosTagPatternParser: ``!``
  inversion, ``( ... )`` variant groups, ``prefix*`` expansion against
  the tagger's SORTED tag list, with the exact inParen/inverted state
  machine (inversion outside parens resets after one token; parenClose
  resets both).
- ``EN_NGRAM_PATTERNS`` — resources/languages-default.xml ``en`` ngrams
  (name / noun / subject-suffix / title / keyword) and the stemmer
  inclusion pattern ``!(IN TO CC DT)``; the default and experimental
  configs are byte-identical for ``en``.
- ``tag_en_sentence`` — the English tagging chain.  The initial-tag
  heuristics are InitialTagger.getTagForWordEn ported branch-for-branch
  (third-party/rdrpostagger/src/.../InitialTagger.java:176-216).  STAND-IN
  (documented deviation): the reference feeds a ~100k-entry English.DICT
  lexicon and an RDR correction-rule tree (model files fetched from the
  RDRPOSTagger release at build time — binary models, not in this
  sandbox); here the DICT lookup is a built-in closed-class function-word
  table (public Penn-Treebank tags for words whose tag is unambiguous)
  and the RDR correction pass is identity.  Open-class words flow
  through the exact upstream suffix/shape heuristics, which is what the
  patterns key on (NNP*/NN*/JJ/VBG/...).

Everything here is pure per-sentence computation; the distributed
plumbing stays in the keyword-projection stages.
"""

from __future__ import annotations

from typing import List

__all__ = [
    "PosTagger",
    "PosPattern",
    "EN_TAGS",
    "EN_NGRAM_PATTERNS",
    "EN_TAGGER",
    "EN_PATTERNS",
    "EN_INCLUSION_PATTERN",
    "tag_en_sentence",
]


class PosTagger:
    """pos/PosTagger.java — the test-constructor semantics: a tag list
    registered in first-appearance order, one bit per distinct tag."""

    def __init__(self, iso_code: str, tags: list[str]):
        self.iso_code = iso_code
        self.tag_names: list[str] = []
        self.tag_dict: dict[str, int] = {}
        for t in tags:
            if t not in self.tag_dict:
                self.tag_dict[t] = len(self.tag_names)
                self.tag_names.append(t)

    def encode_tag_name(self, tag_name: str) -> int:
        tid = self.tag_dict.get(tag_name)
        if tid is None:
            return 0
        return 1 << tid

    def encode_tag_names(self, tag_names: list[str]) -> int:
        ret = 0
        for t in tag_names:
            ret |= self.encode_tag_name(t)
        return ret

    def decode_tag_name(self, encoded: int) -> str:
        if encoded == 0:
            return "?"
        return self.tag_name((encoded & -encoded).bit_length() - 1)

    def tag_name(self, tag_id: int) -> str:
        if tag_id < 0 or tag_id >= len(self.tag_names):
            return "?"
        return self.tag_names[tag_id]

    def tags(self) -> list[str]:
        return sorted(self.tag_dict)

    def tag_ids_for_prefix(self, prefix: str) -> list[int]:
        return [
            tid for tag, tid in self.tag_dict.items() if tag.startswith(prefix)
        ]


def _tokenize_pattern(expression: str) -> list[str]:
    """PosTagPatternParser.tokenize: ( ) ! are single tokens; words run
    to the next '(' / ')' / space (``!`` inside a word does NOT split —
    upstream only breaks words on "() ")."""
    tokens: list[str] = []
    pos = 0
    n = len(expression)
    while pos < n:
        c = expression[pos]
        if c in "()!":
            tokens.append(c)
            pos += 1
        elif c == " " or c == "\xa0":  # Character.isSpaceChar
            pos += 1
        else:
            end = pos + 1
            while end < n and expression[end] not in "() ":
                end += 1
            tokens.append(expression[pos:end])
            pos = end
    return tokens


def _parse_pattern(tagger: PosTagger, expression: str) -> list[list[str]]:
    """PosTagPatternParser.parse — the exact inverted/inParen state
    machine."""
    all_tags = tagger.tags()
    variants: list[list[str]] = []
    inverted = False
    in_paren = False

    def begin_token():
        variants.append([])
        if inverted:
            variants[-1].extend(all_tags)

    for token in _tokenize_pattern(expression):
        if token == "!":
            inverted = True
        elif token == "(":
            in_paren = True
            begin_token()
        elif token == ")":
            in_paren = False
            inverted = False
        else:
            if not in_paren:
                begin_token()
            if token.endswith("*"):
                prefix = token[:-1]
                expanded = [
                    t for t in all_tags if not prefix or t.startswith(prefix)
                ]
            else:
                expanded = [token]
            if inverted:
                variants[-1] = [t for t in variants[-1] if t not in expanded]
            else:
                variants[-1].extend(expanded)
            if not in_paren:
                inverted = False
    return variants


class PosPattern:
    """pos/PosPattern.java — a sequence of tag bit-masks with the
    comma-window matching rules."""

    def __init__(self, tagger: PosTagger, expression: str):
        self.pattern: list[int] = [
            tagger.encode_tag_names(variants)
            for variants in _parse_pattern(tagger, expression)
        ]
        if not self.pattern:
            raise ValueError("Zero length patterns are not allowed")

    def size(self) -> int:
        return len(self.pattern)

    def match_sentence(self, sentence, ret: list) -> int:
        """matchSentence: append (start, end) spans to ``ret``; returns
        the number appended.  ``sentence`` needs ``pos_tags``,
        ``__len__`` and ``next_comma_pos``."""
        pat = self.pattern
        first = pat[0]
        tags = sentence.pos_tags
        n = len(sentence)
        cnt = 0
        if len(pat) == 1:
            for i in range(n):
                if tags[i] & first == 0:
                    continue
                ret.append((i, i + 1))
                cnt += 1
            return cnt
        i = 0
        limit = n - len(pat)
        while i <= limit:
            if tags[i] & first == 0:
                i += 1
                continue
            ok = True
            for j in range(1, len(pat)):
                if tags[i + j] & pat[j] == 0:
                    ok = False
                    break
            if not ok:
                i += 1
                continue
            next_comma = sentence.next_comma_pos(i)
            if next_comma < i + len(pat) - 1:
                # upstream assigns i = nextCommaPos and lets the loop's
                # i++ advance past the comma
                i = next_comma + 1
                continue
            ret.append((i, i + len(pat)))
            cnt += 1
            i += 1
        return cnt

    def is_match(self, sentence, pos: int) -> bool:
        pat = self.pattern
        if pos + len(pat) > len(sentence):
            return False
        tags = sentence.pos_tags
        if tags[pos] & pat[0] == 0:
            return False
        if len(pat) == 1:
            return True
        if sentence.next_comma_pos(pos) < pos + len(pat) - 1:
            return False
        for j in range(1, len(pat)):
            if tags[pos + j] & pat[j] == 0:
                return False
        return True

    def match_tag_pattern(self, tags: list[int]) -> list[bool]:
        """matchTagPattern -> per-position BitSet as a bool list."""
        pat = self.pattern
        n = len(tags)
        bs = [False] * n
        if len(pat) == 1:
            p0 = pat[0]
            for i in range(n):
                bs[i] = (tags[i] & p0) != 0
            return bs
        for i in range(n - len(pat) + 1):
            ok = True
            for j in range(len(pat)):
                if tags[i + j] & pat[j] == 0:
                    ok = False
                    break
            if ok:
                bs[i] = True
        return bs


# ---------------------------------------------------------------------------
# The English language definition (languages-default.xml, en section)
# ---------------------------------------------------------------------------

# Penn Treebank tag inventory in a fixed registration order (the
# reference derives its order from English.DICT's line order; any fixed
# order yields identical matching because patterns go through the name
# registry — only bit ASSIGNMENTS differ, never which words match).
EN_TAGS = [
    "CC", "CD", "DT", "EX", "FW", "IN", "JJ", "JJR", "JJS", "LS", "MD",
    "NN", "NNS", "NNP", "NNPS", "PDT", "POS", "PRP", "PRP$", "RB", "RBR",
    "RBS", "RP", "SYM", "TO", "UH", "VB", "VBD", "VBG", "VBN", "VBP",
    "VBZ", "WDT", "WP", "WP$", "WRB", "''", "?",
]

EN_NGRAM_PATTERNS: dict[str, list[str]] = {
    # languages-default.xml <ngrams type=...> blocks, transcribed
    "name": [
        "NNP*",
        "NNP* NNP*",
        "NNP* (NNP* IN DT CC) NNP*",
        "NNP* (NNP* IN DT CC) (NNP* IN DT CC) NNP*",
    ],
    "noun": [
        "VBG",
        "RB VBG",
        "(NNP* JJ)",
        "(NN* JJ) NN*",
        "(NN* JJ) (NN* JJ) NN*",
        "(NN* JJ) (NN* JJ) (NN* JJ) NN*",
        "(NNP* JJ) (NNP* IN TO CC) NNP*",
        "(NNP* JJ) (NNP* IN TO CC) DT NNP*",
        "(NNP* JJ) (NNP* IN TO CC) (NNP* IN TO CC) NNP*",
    ],
    "subject-suffix": [
        "(VBD VBZ)",
        "MD VB",
        "VBZ DT",
        "(DT RB VBD VBP VBN JJ*) (VBD VBG VBP VBN VBZ)",
    ],
    "title": [
        "!(CC IN DT TO)",
        "!CC !(IN DT TO)",
        "!CC * !(IN DT TO)",
        "!CC * * !(IN DT TO)",
    ],
    "keyword": [
        "(N* VBG VBN JJ* R* VBG)",
        "(N* VBG VBN JJ* R* VBG) (N* VBG VBN)",
        "(N* VBG VBN) CD",
        "(N* VBG VBN JJ* R* VBG) (N* VBG VBN JJ* R* VBG) (N* VBG VBN)",
        "NNP* (IN TO CC NNP*) (N* VBG VBN)",
        "(N* VBG VBN) (N* VBG VBN) CD",
        "(N* VBG VBN JJ* R* VBG) (N* VBG VBN JJ* R* VBG) (N* VBG VBN JJ* R* VBG) (N* VBG VBN)",
        "NNP* (DT IN TO CC) (IN TO CC) NNP*",
    ],
}

EN_TAGGER = PosTagger("en", EN_TAGS)

EN_PATTERNS: dict[str, list[PosPattern]] = {
    category: [PosPattern(EN_TAGGER, expr) for expr in exprs]
    for category, exprs in EN_NGRAM_PATTERNS.items()
}

# the stemmer's pospattern: words tagged IN/TO/CC/DT are excluded from
# multi-word stemmed joins (languages-default.xml stemmer block)
EN_INCLUSION_PATTERN = PosPattern(EN_TAGGER, "!(IN TO CC DT)")


def match_grammar_pattern(sentence, category: str) -> list[tuple]:
    """LanguageDefinition.matchGrammarPattern(sentence, category) — all
    patterns' spans appended in pattern order."""
    spans: list[tuple] = []
    for pattern in EN_PATTERNS.get(category, ()):
        pattern.match_sentence(sentence, spans)
    return spans


def match_grammar_pattern_at(sentence, category: str, pos: int) -> bool:
    """LanguageDefinition.matchGrammarPattern(sentence, category, pos)."""
    for pattern in EN_PATTERNS.get(category, ()):
        if pattern.is_match(sentence, pos):
            return True
    return False


def match_grammar_pattern_span(sentence, category: str, span: tuple) -> bool:
    """LanguageDefinition.matchGrammarPattern(sentence, category, span):
    only patterns of the span's exact length are consulted."""
    start, end = span
    size = end - start
    for pattern in EN_PATTERNS.get(category, ()):
        if pattern.size() != size:
            continue
        if pattern.is_match(sentence, start):
            return True
    return False


# ---------------------------------------------------------------------------
# English initial tagger (InitialTagger.getTagForWordEn, ported exactly)
# with a built-in closed-class dictionary standing in for English.DICT
# ---------------------------------------------------------------------------

# Unambiguous closed-class English words with their Penn-Treebank tags —
# public knowledge (the PTB tag set and English function words).  The
# reference's English.DICT maps ~100k words incl. open-class entries; this
# stand-in covers the closed classes the grammar patterns discriminate on
# (DT/IN/TO/CC/MD/PRP/WDT/...) and lets open-class words flow through the
# upstream shape heuristics below.
EN_DICT: dict[str, str] = {
    # determiners
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT", "each": "DT", "every": "DT", "no": "DT",
    "some": "DT", "any": "DT", "all": "DT", "both": "DT", "another": "DT",
    # conjunctions
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC", "yet": "CC",
    "so": "CC", "plus": "CC",
    # to
    "to": "TO",
    # prepositions / subordinating conjunctions
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN",
    "for": "IN", "with": "IN", "from": "IN", "into": "IN", "onto": "IN",
    "about": "IN", "against": "IN", "between": "IN", "through": "IN",
    "during": "IN", "before": "IN", "after": "IN", "above": "IN",
    "below": "IN", "under": "IN", "over": "IN", "within": "IN",
    "without": "IN", "among": "IN", "across": "IN", "behind": "IN",
    "beyond": "IN", "near": "IN", "since": "IN", "until": "IN",
    "upon": "IN", "toward": "IN", "towards": "IN", "via": "IN",
    "per": "IN", "if": "IN", "because": "IN", "while": "IN",
    "although": "IN", "though": "IN", "whether": "IN", "unless": "IN",
    "as": "IN", "than": "IN", "like": "IN", "despite": "IN",
    # modals
    "can": "MD", "could": "MD", "will": "MD", "would": "MD",
    "shall": "MD", "should": "MD", "may": "MD", "might": "MD",
    "must": "MD", "ought": "MD",
    # pronouns
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP", "me": "PRP", "him": "PRP", "her": "PRP",
    "us": "PRP", "them": "PRP", "himself": "PRP", "herself": "PRP",
    "itself": "PRP", "themselves": "PRP", "myself": "PRP",
    "yourself": "PRP", "ourselves": "PRP",
    "my": "PRP$", "your": "PRP$", "his": "PRP$", "its": "PRP$",
    "our": "PRP$", "their": "PRP$",
    # wh-words
    "which": "WDT", "who": "WP", "whom": "WP", "whose": "WP$",
    "what": "WP", "when": "WRB", "where": "WRB", "why": "WRB",
    "how": "WRB",
    # common verbs (forms of be/have/do — unambiguous inflections)
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "being": "VBG", "am": "VBP",
    "has": "VBZ", "have": "VBP", "had": "VBD", "having": "VBG",
    "does": "VBZ", "do": "VBP", "did": "VBD", "doing": "VBG",
    "rose": "VBD", "formed": "VBD", "began": "VBD", "gave": "VBD",
    "won": "VBD", "made": "VBD", "became": "VBD", "led": "VBD",
    "broke": "VBD", "set": "VBD", "ordered": "VBD", "angered": "VBD",
    "defied": "VBD", "opposed": "VBD", "dominated": "VBD",
    "threatened": "VBD", "invaded": "VBD", "built": "VBD",
    "completed": "VBD", "extended": "VBD", "realigned": "VBD",
    "concluded": "VBD", "initiated": "VBD", "centralized": "VBD",
    "proclaimed": "VBD", "assassinated": "VBD", "stabbed": "VBD",
    "restored": "VBD", "known": "VBN", "crossing": "VBG",
    "marching": "VBG", "leaving": "VBG", "assuming": "VBG",
    "including": "VBG", "defeating": "VBG", "solidifying": "VBG",
    "bearing": "VBG", "drove": "VBD", "was": "VBD",
    # adverbs the subject-suffix patterns key on
    "not": "RB", "never": "RB", "also": "RB", "often": "RB",
    "eventually": "RB", "fully": "RB", "openly": "RB", "greatly": "RB",
    "later": "RB", "there": "EX",
}


def _jj1(s: str) -> bool:
    idx = s.find("-")
    while idx >= 0:
        if idx > 0 and s[idx - 1].isdigit():
            return True
        if idx + 1 < len(s) and s[idx + 1].isdigit():
            return True
        idx = s.find("-", idx + 1)
    return False


def _nn(s: str) -> bool:
    return (
        s.endswith("ness") or s.endswith("ment") or s.endswith("ship")
        or s.startswith("Ex") or s.startswith("ex")
        or s.startswith("Self-") or s.startswith("self-")
    )


def _jj2(s: str) -> bool:
    return (
        s.startswith("Inter") or s.startswith("inter")
        or s.startswith("Dis") or s.startswith("dis")
        or s.startswith("Anti") or s.startswith("anti")
    )


def _jj3(s: str) -> bool:
    return (
        "-" in s
        or s.endswith("ful") or s.endswith("ous") or s.endswith("ble")
        or s.endswith("ic") or s.endswith("ive") or s.endswith("est")
        or s.endswith("able") or s.endswith("al")
    )


def _url(s: str) -> bool:
    i = s.find(".")
    return i >= 0 and i != len(s) - 1


def _cd(s: str) -> bool:
    return any(c.isdigit() for c in s)


def _tag_word_en(word: str) -> str:
    """InitialTagger.getTagForWordEn, branch order preserved."""
    if '"' in word or "“" in word or "”" in word:
        return "''"
    if word in ("[", "]", "(", ")", "<", ">", "!"):
        return "?"
    tag = EN_DICT.get(word)
    if tag is not None:
        return tag
    lower = word.lower()
    tag = EN_DICT.get(lower)
    if tag is not None:
        return tag
    if not word:
        return "?"
    if _jj1(word):
        return "JJ"
    if _url(word):
        return "NN"
    if _cd(word):
        return "CD"
    if _nn(word):
        return "NN"
    if word[0].islower() and word.endswith("s"):
        return "NNS"
    if word[0].isupper():
        return "NNP"
    if _jj2(word):
        return "JJ"
    if word.endswith("vbg"):
        return "VBG"
    if word.endswith("vbn"):
        return "VBN"
    if _jj3(word):
        return "JJ"
    if word.endswith("ly"):
        return "RB"
    return "NN"


def tag_en_sentence(words: List[str]) -> list[int]:
    """posTagSentence for ``en``: per-word encoded tag bit (one bit or
    zero, matching more complex masks)."""
    return [EN_TAGGER.encode_tag_name(_tag_word_en(w)) for w in words]
