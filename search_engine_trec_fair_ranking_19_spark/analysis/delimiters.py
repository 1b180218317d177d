"""Tokenizer delimiter alphabets (parity data tables).

Each constant is the exact character set the reference passes to
``java.util.StringTokenizer`` for one field class — extracted verbatim from
`T/lexicalAnalysis/collections/SemanticScholar/S2TextualEntryTokens.java:79-105`
(build side, per-field) and `T/ui/Search.java:36` (query side). StringTokenizer
treats the string as a character *set*; we store each set deduped+sorted.
Tokenization = split on any char in the set, dropping empty tokens.
"""

TEXT_DELIMITERS: str = '\t\n\x0c\r !"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~\x82\x84\x85\x8d\x8e\x91\x92\x93\x94\x96\x97\x99\xa0¡£§©ª«\xad®°±²³´¶·¸¹º»¿×˚׳\u2000\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u200b\u200e‐‑‒–—―‖‗‘’‚‛“”„‟†‡•…\u2028\u202f′″‵‹›※⁃⁄⁎⁰⁴⁵⁶⁷⁸⁹⁺⁻₀₁₂₃₄₅₆₇₈₉€⃝™ⅰ←↑→↓↔⇑⇒⇔⇤−∕∗∙∞∣∥∼≈≡≥≪≫⊤⊥⋄⋅⋆⋯⌈⌜〈〉⎯␣␥①②③④⑤⑥⑦⑧⑨⑩ⓡ─│┙┚╅╉║■□▪▲△▵▶▸►▼▾◆◇◊◌●◦◮☁☆☞♀♂♠♣♦♮♯✉✓✔✞✣✦✩✭✰✳✴✸✿❖❚❛❯➀➁➂➃➄➔➝➢➤⦁⩾⪡⪢\u2fff\u3000、。〈〉《》「」『【】〔〕と・\ue003\ue004\ue009\ue011\ue0d5\uf000\uf020\uf025\uf02a\uf02d\uf034\uf03c\uf044\uf047\uf053\uf05b\uf061\uf062\uf063\uf064\uf065\uf067\uf06b\uf06c\uf06d\uf06e\uf06f\uf070\uf071\uf072\uf073\uf074\uf075\uf076\uf077\uf078\uf079\uf07a\uf07d\uf07e\uf080\uf081\uf082\uf083\uf084\uf085\uf086\uf087\uf088\uf089\uf0a0\uf0a2\uf0a3\uf0a7\uf0a8\uf0ab\uf0ad\uf0b3\uf0b4\uf0b5\uf0b7\uf0b9\uf0ba\uf0bd\uf0be\uf0d6\uf0d8\uf0e0\uf0e1\uf0e2\uf0e8\uf0eb\uf0f1\uf0f7\uf8e7\ufeff＂（）＋，－／：＜＞？［］｜～\ufffb�'
AUTHORS_DELIMITERS: str = '\n\r "#&\'()*,-.;@`©«\xad´·»ʿ׳ᆞ\u2009\u200e‐‑–—―‘’“”„‟†‡•‧′‹↑−∗⋅、（），．･'
VENUE_DELIMITERS: str = '\n\r !"#&\'()*+,-./:;=?@[\\]|\xad®´–’™'
JOURNAL_DELIMITERS: str = '\n\r !"&\'()*+,-./:;?@[]\xad´ʿ’“”'
ENTITIES_DELIMITERS: str = '\n\r !"&\'()*,-./:;<>@[]^_–’'
DEFAULT_DELIMITERS: str = ''
QUERY_DELIMITERS: str = ' "#\'()*+,-./?[]“”，'
