"""Text kernel tests: deterministic extraction, url parsing, tokenizing,
language ID, fingerprints, MinHash/SimHash properties."""

import numpy as np

from light_curve_ray.kernels import hashing
from light_curve_ray.kernels.textkit import (
    extract_text,
    fingerprint,
    fnv1a64,
    lang_id,
    quality_scores,
    token_count_bpe,
    token_count_ws,
    url_domain,
)


class TestExtract:
    def test_strips_tags_and_scripts(self):
        html = b"<html><head><title>T</title><script>var x=1;</script></head>" \
               b"<body><p>Hello <b>world</b></p><style>.c{}</style>Bye</body></html>"
        # title is inside <head>, which is skipped entirely
        assert extract_text(html) == "Hello world Bye"

    def test_entities(self):
        assert extract_text(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_whitespace_normalized(self):
        assert extract_text(b"<div>  a\n\n  b\t c </div>") == "a b c"

    def test_multibyte_utf8(self):
        assert extract_text("<p>héllo wörld — ünïcode</p>".encode()) == "héllo wörld — ünïcode"

    def test_deterministic_bytes(self):
        html = b"<p>x</p>" * 100
        assert extract_text(html).encode() == extract_text(html).encode()

    def test_malformed_never_raises(self):
        assert isinstance(extract_text(b"<p><<<>>zzz<b"), str)
        assert isinstance(extract_text(b"\xff\xfe broken"), str)


class TestUrl:
    def test_basic(self):
        assert url_domain("https://example.com/path/x") == "example.com"

    def test_port_query_fragment(self):
        assert url_domain("http://A.B.com:8080/x?q=1#f") == "a.b.com"
        assert url_domain("https://example.com?q=1") == "example.com"
        assert url_domain("https://example.com#frag") == "example.com"

    def test_no_scheme(self):
        assert url_domain("example.com/path") == "example.com"

    def test_empty(self):
        assert url_domain("") == ""


def test_token_counts():
    assert token_count_ws("a b  c") == 3
    assert token_count_bpe("a, b c!") == 5


def test_lang_id():
    assert lang_id("the cat and the dog is in the house for now") == "en"
    assert lang_id("der hund und die katze ist nicht ein tier") == "de"
    assert lang_id("это русский текст на кириллице") == "ru"
    assert lang_id("これは日本語のテキストです") == "ja"
    assert lang_id("") == "und"
    assert lang_id("zzz qqq xxx") == "und"


def test_quality_scores():
    q = quality_scores("The cat, and dog. 12")
    assert q["n_words"] == 5
    assert q["n_chars"] == 20
    assert 0 < q["punct_ratio"] < 0.2
    assert q["digit_ratio"] == 2 / 20
    assert quality_scores("")["n_chars"] == 0


def test_fingerprint_deterministic():
    assert fingerprint("a  b") == fingerprint("a b")
    assert fingerprint("a b") != fingerprint("a c")
    assert fnv1a64(b"") == 0xCBF29CE484222325


class TestHashing:
    def test_shingles(self):
        h = hashing.shingle_hashes("a b c d e".split(), k=3)
        assert h.size == 3  # abc bcd cde
        h2 = hashing.shingle_hashes("a b".split(), k=3)
        assert h2.size == 1  # short doc -> one shingle
        assert hashing.shingle_hashes([], k=3).size == 0

    def test_minhash_jaccard_estimate(self):
        rng = np.random.RandomState(42)
        base = rng.randint(0, 2**63, 1000).astype(np.uint64)
        a = base[:800]
        b = base[200:]  # true J = 600/1000 = 0.6
        sa = hashing.minhash_signature(np.unique(a), num_perm=256)
        sb = hashing.minhash_signature(np.unique(b), num_perm=256)
        est = (sa == sb).mean()
        assert abs(est - 0.6) < 0.1

    def test_minhash_batch_matches_single(self):
        rng = np.random.RandomState(1)
        sets = [np.unique(rng.randint(0, 2**63, 50).astype(np.uint64)) for _ in range(5)]
        batch = hashing.minhash_signatures_batch(sets, num_perm=64)
        for i, s in enumerate(sets):
            np.testing.assert_array_equal(batch[i], hashing.minhash_signature(s, num_perm=64))

    def test_identical_docs_share_all_bands(self):
        s = hashing.minhash_signature(np.arange(100, dtype=np.uint64), num_perm=128)
        assert hashing.lsh_band_keys(s) == hashing.lsh_band_keys(s.copy())

    def test_simhash_similar_docs_close(self):
        d1 = ("the quick brown fox jumps over the lazy dog " * 10).split()
        d2 = ("the quick brown fox leaps over the lazy dog " * 10).split()
        d3 = ("completely different words entirely unrelated content here " * 10).split()
        h1, h2, h3 = (hashing.simhash64(d) for d in (d1, d2, d3))
        assert hashing.hamming64(h1, h2) < hashing.hamming64(h1, h3)

    def test_jaccard(self):
        a = np.array([1, 2, 3], dtype=np.uint64)
        b = np.array([2, 3, 4], dtype=np.uint64)
        assert hashing.jaccard(a, b) == 0.5
        assert hashing.jaccard(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 1.0


def test_fast_extract_equals_parser_on_corpus():
    """The default regex kernel is byte-identical to the stdlib-parser
    kernel across the whole synthetic corpus (well-formed pages)."""
    from light_curve_ray.kernels.textkit import (
        extract_text,
        extract_text_parser,
    )
    from light_curve_ray.sources.pages import generate_pages_table

    tbl = generate_pages_table(n_rows=500, n_domains=20, seed=123,
                               page_kb=3.0)
    for h in tbl["html"].to_pylist():
        assert extract_text(h).encode() == extract_text_parser(h).encode()


def test_repetition_signals_crafted():
    from light_curve_ray.kernels.textkit import repetition_signals

    # 4 non-blank lines, "dup dup" twice -> 3 distinct
    text = "dup dup\nunique one\ndup dup\n   \nlast line"
    r = repetition_signals(text)
    assert r["n_lines"] == 4
    assert abs(r["dup_line_frac"] - (1 - 3 / 4)) < 1e-12
    # dup chars: 'dup dup' (7) x 2 occurrences over 7+10+7+9 line chars
    assert abs(r["dup_line_char_frac"] - 14 / 33) < 1e-12
    # words: dup dup unique one dup dup last line -> top 2-gram 'dup dup'
    # occurs 3x ('dup dup', 'dup dup' at pos 4-5, plus bridge 'dup dup'?)
    # enumerate: (dup,dup) (dup,unique) (unique,one) (one,dup) (dup,dup)
    # (dup,last) (last,line) -> 'dup dup' twice
    assert abs(r["top_2gram_char_frac"] - 2 * 7 / len(text)) < 1e-12

    # all-identical lines and heavy 3-gram repetition
    t2 = "a b c a b c a b c"
    r2 = repetition_signals(t2)
    # 3-grams: 'a b c' x3, 'b c a' x2, 'c a b' x2 -> dup chars 3*5+2*5+2*5
    assert abs(r2["dup_3gram_char_frac"] - (3 * 5 + 2 * 5 + 2 * 5)
               / len(t2)) < 1e-12
    assert r2["dup_line_frac"] == 0.0  # single line

    # tie-break: two 2-grams both occur twice -> lexicographically least
    t3 = "b a b a z a b a"
    # 2-grams: (b,a)x3? enumerate: b a, a b, b a, a z, z a, a b, b a
    # -> 'b a' x3 top; craft a true tie instead:
    t4 = "x y x y"  # 'x y' x2, 'y x' x1
    r4 = repetition_signals(t4)
    assert abs(r4["top_2gram_char_frac"] - 2 * 3 / len(t4)) < 1e-12
    r3 = repetition_signals(t3)
    assert abs(r3["top_2gram_char_frac"] - 3 * 3 / len(t3)) < 1e-12
    assert repetition_signals("")["n_lines"] == 0


def test_redact_pii_patterns_and_order():
    import pyarrow as pa

    from light_curve_ray.kernels.textkit import redact_pii

    red, c = redact_pii(pa.array([
        "mail a.b+c%d@ex-1.co.uk then 10.0.0.1 and 192.168.255.3 "
        "call 555-123-4567 or 555.123.4567",
        "no pii here at all",
        "v1.2.3.4567 is a version, not an ip; 12-34-56 not a phone",
        None,
    ]))
    out = red.to_pylist()
    assert out[0] == ("mail <EMAIL> then <IP> and <IP> "
                      "call <PHONE> or <PHONE>")
    assert out[1] == "no pii here at all"
    # \b guards: 4-digit tail breaks the ipv4 match, short groups break
    # the phone match
    assert "<IP>" not in out[2] and "<PHONE>" not in out[2]
    assert out[3] is None
    assert c["email"].to_pylist() == [1, 0, 0, None]
    assert c["ip"].to_pylist() == [2, 0, 0, None]
    assert c["phone"].to_pylist() == [2, 0, 0, None]


def test_redact_pii_no_double_count():
    # counts are sequential (count-then-replace): an email's host digits
    # must never also count as an IP, and replacement tokens must never
    # re-match a later pattern
    import pyarrow as pa

    from light_curve_ray.kernels.textkit import redact_pii

    red, c = redact_pii(pa.array(["root@10.0.0.1.example.com"]))
    assert c["email"].to_pylist() == [1]
    assert c["ip"].to_pylist() == [0]
    assert red.to_pylist() == ["root@<IP>.example.com"] or \
        red.to_pylist() == ["<EMAIL>"]


def test_levenshtein_matches_duckdb_bytes():
    """Byte-exact parity with DuckDB's levenshtein (which counts UTF-8
    BYTES, not codepoints) — the similarity-join verify contract."""
    import random

    import duckdb

    from light_curve_ray.kernels.textkit import levenshtein

    con = duckdb.connect()
    rng = random.Random(17)
    cases = [("kitten", "sitting"), ("", ""), ("", "abc"), ("abc", ""),
             ("héllo", "hello"), ("日本語", "日本誤"), ("same", "same")]
    for _ in range(300):
        a = "".join(rng.choice("abcdé日") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcdé日") for _ in range(rng.randint(0, 12)))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_soundex_canonical_nara_examples():
    from light_curve_ray.kernels.textkit import soundex

    # the canonical example set from the NARA Soundex specification
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"   # h transparent
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"    # vowel breaks the run
    assert soundex("Pfister") == "P236"    # first-letter code skipped
    assert soundex("Honeyman") == "H555"
    assert soundex("Washington") == "W252"
    assert soundex("Lee") == "L000"        # zero-padded
    assert soundex("Jackson") == "J250"
    assert soundex("") == ""
    assert soundex("42!") == ""            # non-alpha stripped
    assert soundex("O'Brien") == soundex("obrien")


def test_soundex_blocking_property():
    from light_curve_ray.kernels.textkit import soundex

    # blocking guarantee: phonetically-close spellings share a block
    # (note soundex keeps the first LETTER literally, so
    # catherine/kathryn land in different blocks by design)
    for a, b in [("smith", "smyth"), ("meyer", "meier"),
                 ("gail", "gayle")]:
        assert soundex(a) == soundex(b)
    assert soundex("smith") != soundex("jones")
