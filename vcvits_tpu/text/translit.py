"""Kana -> Hepburn romaji transliteration (host-side text front-end).

The reference delegates all transliteration to `unidecode`
(/root/reference/vits/text/cleaners/cleaners.py:17-18) and ships a romaji
syllable inventory for tokenization
(/root/reference/vits/text/cleaners/japanese_mapping.py). unidecode is not
a baked-in dependency here, so the kana coverage is implemented directly:
standard Hepburn for hiragana + katakana, youon digraphs derived by rule,
sokuon gemination, chouonpu as '-' (matching unidecode's output for 'ー'),
and NFKD accent-stripping for Latin script. Kanji have no deterministic
reading without a dictionary; like unidecode, the output for kanji is a
best-effort skip (dropped), which the cleaner surfaces via a one-time
warning instead of silently deleting entire sentences.
"""

from __future__ import annotations

import logging
import unicodedata

logger = logging.getLogger(__name__)

# Standard Hepburn readings for single hiragana (gojuon + voiced + semi-voiced
# + small kana + symbols). Katakana are normalized to hiragana first.
_BASE = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "wi", "ゑ": "we", "を": "wo", "ん": "n",
    "ゔ": "vu",
    # small (sutegana) vowels read as plain vowels when standalone
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゃ": "ya", "ゅ": "yu", "ょ": "yo", "ゎ": "wa",
    "ゕ": "ka", "ゖ": "ke",
}

# youon digraphs: consonant stem of the -i kana + small ya/yu/yo.
_SMALL_Y = {"ゃ": "a", "ゅ": "u", "ょ": "o"}

# CJK punctuation -> ASCII (same targets unidecode produces for these).
_PUNCT = {
    "。": ".", "、": ",", "，": ",", "？": "?", "！": "!", "：": ":",
    "「": '"', "」": '"', "『": '"', "』": '"', "（": "(", "）": ")",
    "《": "(", "》": ")", "【": "[", "】": "]", "・": "/", "　": " ",
    "ー": "-",  # chouonpu (long-vowel mark)
}


def _kata_to_hira(ch: str) -> str:
    o = ord(ch)
    if 0x30A1 <= o <= 0x30F6:  # ァ..ヶ -> ぁ..ゖ
        return chr(o - 0x60)
    return ch


def _digraph(stem_reading: str, small: str) -> str:
    """kya/sha/cha/ja... from the -i kana reading + small ya/yu/yo vowel."""
    vowel = _SMALL_Y[small]
    if stem_reading.endswith("shi") or stem_reading.endswith("chi"):
        return stem_reading[:-1] + vowel  # shi+ya -> sha, chi+yu -> chu
    if stem_reading.endswith("ji"):
        return stem_reading[:-1] + vowel  # ji+ya -> ja
    return stem_reading[:-1] + "y" + vowel  # ki+ya -> kya


def kana_to_romaji(text: str) -> str:
    """Transliterate all kana in `text` to Hepburn romaji; other characters
    pass through unchanged."""
    chars = [_kata_to_hira(c) for c in unicodedata.normalize("NFC", text)]
    out: list[str] = []
    geminate = False
    i = 0
    n = len(chars)
    while i < n:
        c = chars[i]
        if c == "っ":
            geminate = True
            i += 1
            continue
        if c in _PUNCT:
            out.append(_PUNCT[c])
            geminate = False
            i += 1
            continue
        reading = _BASE.get(c)
        if reading is None:
            out.append(c)
            geminate = False
            i += 1
            continue
        if (reading.endswith("i") and i + 1 < n and chars[i + 1] in _SMALL_Y
                and len(reading) > 1):
            reading = _digraph(reading, chars[i + 1])
            i += 1
        if geminate:
            # Hepburn: geminated ch- is written tch (っち -> tchi).
            out.append("t" if reading.startswith("ch") else reading[0])
            geminate = False
        out.append(reading)
        i += 1
    return "".join(out)


_warned_dropped = False


def to_ascii(text: str) -> str:
    """Kana -> romaji, then NFKD accent-strip for Latin; anything still
    non-ASCII (e.g. kanji, hangul) is dropped with a one-time warning."""
    global _warned_dropped
    text = kana_to_romaji(text)
    nfkd = unicodedata.normalize("NFKD", text)
    kept = []
    dropped = []
    for ch in nfkd:
        if ord(ch) < 128:
            kept.append(ch)
        elif not unicodedata.combining(ch):
            dropped.append(ch)
    if dropped and not _warned_dropped:
        _warned_dropped = True
        logger.warning(
            "to_ascii dropped %d untransliterable character(s) (e.g. %r); "
            "kanji need a reading dictionary — feed kana or romaji input",
            len(dropped), "".join(dropped[:8]),
        )
    return "".join(kept)
