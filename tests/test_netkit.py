from crawler4j_spark.functions.netkit import (
    binary_to_text,
    extract_urls,
    has_binary_content,
    has_plain_text_content,
    normalize_anchor,
)


def test_extract_basic():
    urls = extract_urls("see http://example.com/a and https://foo.org/b?x=1 ok")
    assert "http://example.com/a" in urls
    assert "https://foo.org/b?x=1" in urls


def test_extract_www_prefixed():
    urls = extract_urls("visit www.example.com today")
    assert any(u.startswith("http://www.example.com") for u in urls)


def test_extract_dedup_first_occurrence_order():
    urls = extract_urls("http://a.com/x http://b.com/y http://a.com/x")
    assert urls == ["http://a.com/x", "http://b.com/y"]


def test_extract_none_and_empty():
    assert extract_urls(None) == []
    assert extract_urls("") == []
    assert extract_urls("no urls here at all") == []


# --- binary_to_text: Tika-rendering analog (BinaryParseData.java:64-79) ---

def test_binary_to_text_printable_runs_in_order():
    data = b"\x89PNG\r\n\x1a\n\x00firstrun\x00\x01second run\xff"
    # "PNG" is a 3-byte run (< 4 floor) and drops; runs keep payload order
    assert binary_to_text(data) == "firstrun\nsecond run"


def test_binary_to_text_min_run_floor():
    assert binary_to_text(b"ab\x00cd\x00abcd\x00abcde") == "abcd\nabcde"


def test_binary_to_text_tab_is_printable_newline_is_not():
    # \t stays inside a run; \n splits runs (the join re-inserts one)
    assert binary_to_text(b"a\tb c\nd e f") == "a\tb c\nd e f"
    assert binary_to_text(b"w\tx y\x00zzzz") == "w\tx y\nzzzz"


def test_binary_to_text_empty_and_none():
    assert binary_to_text(None) == ""
    assert binary_to_text(b"") == ""
    assert binary_to_text(b"\x00\x01\xff") == ""


def test_binary_outlinks_end_to_end_kernels():
    # the parser contract: extract_urls over the rendering (Parser.java:74)
    data = b"%PDF-1.4\n\x00/URI (http://a.example.org/doc)\x00"
    assert extract_urls(binary_to_text(data)) == ["http://a.example.org/doc"]
    # NUL inside the host splits the run: no URL survives
    assert extract_urls(binary_to_text(b"http://exam\x00ple.com/x")) == []


def test_anchor_normalization():
    assert normalize_anchor("a\nb\tc") == "a b c"
    assert normalize_anchor("  hi  ") == "hi"
    assert normalize_anchor(None) == ""
    long = "x" * 150
    out = normalize_anchor(long)
    assert out == "x" * 100 + "..."
    assert normalize_anchor("y" * 100) == "y" * 100  # boundary: not capped


def test_content_type_classifiers():
    assert has_binary_content("image/png")
    assert has_binary_content("application/pdf")
    assert not has_binary_content("text/html")
    assert has_plain_text_content("text/plain")
    assert not has_plain_text_content("text/html; charset=UTF-8")
    assert not has_plain_text_content("application/json")


def test_charset_from_content_type():
    from crawler4j_spark.functions.netkit import charset_from_content_type as cs
    assert cs("text/html; charset=UTF-8") == "UTF-8"
    assert cs("text/plain; charset=ISO-8859-1") == "ISO-8859-1"
    assert cs('text/plain; charset="iso-8859-1"') == "iso-8859-1"
    assert cs("text/plain;charset=Shift_JIS") == "Shift_JIS"
    assert cs("text/html") is None
    assert cs(None) is None
    assert cs("") is None
    # unknown charset name -> UnsupportedCharsetException in the reference
    # (ContentType.getOrDefault, Page.java:129) -> content-fetch error
    import pytest

    from crawler4j_spark.functions.netkit import UnsupportedCharsetError
    with pytest.raises(UnsupportedCharsetError):
        cs("text/html; charset=not-a-real-charset")


def test_bad_charset_mask():
    import pandas as pd

    from crawler4j_spark.functions.netkit import bad_charset_mask

    s = pd.Series([
        "text/html; charset=UTF-8",      # known
        "text/html",                      # absent
        "",                               # empty
        "text/plain; charset=bogus-123",  # unknown -> True
        'text/plain; charset="iso-8859-1"',
    ])
    assert bad_charset_mask(s).tolist() == [False, False, False, True, False]


def test_decode_content():
    from crawler4j_spark.functions.netkit import decode_content as dec
    assert dec("café ü".encode("iso-8859-1"), "ISO-8859-1") == "café ü"
    assert dec("café".encode("utf-8"), None) == "café"  # platform default
    assert dec("日本語".encode("shift_jis"), "Shift_JIS") == "日本語"
    # malformed input -> U+FFFD replacement, like java.lang.String
    assert "�" in dec(b"\xff\xfe caf\xe9", "utf-8")
    assert dec(None, "UTF-8") == ""


def test_vectorized_charset_kernels_match_scalar():
    """charset_series/decode_contents (the batch fast path) must agree with
    the scalar kernels row for row, including absent charsets, null data,
    malformed bytes, and mixed-codec batches."""
    import pandas as pd

    from crawler4j_spark.functions.netkit import (
        charset_from_content_type,
        charset_series,
        decode_content,
        decode_contents,
    )

    ctypes = [
        "text/html; charset=UTF-8",
        'text/plain; charset="iso-8859-1"',
        "text/html",
        None,
        "text/plain; charset= Shift_JIS ",
        "text/html; charset=UTF-8",
    ]
    payloads = [
        "café ü".encode("utf-8"),
        "café ü".encode("iso-8859-1"),
        "plain".encode("utf-8"),
        None,
        "日本語".encode("shift_jis"),
        b"\xff\xfe broken",
    ]
    ct = pd.Series(ctypes, dtype=object)
    data = pd.Series(payloads, dtype=object)

    cs = charset_series(ct)
    dec = decode_contents(data, cs)
    for i in range(len(ctypes)):
        want_cs = charset_from_content_type(ctypes[i])
        got_cs = cs.iloc[i]
        assert (got_cs == want_cs) or (pd.isna(got_cs) and want_cs is None)
        assert dec.iloc[i] == decode_content(payloads[i], want_cs)
