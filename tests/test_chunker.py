"""Golden chunker tests — same behavioral contract the reference pins in
tests/test_processors/content_chunker_end_embedder_test.py (whitespace
tokenizer), plus cleaner/embedding determinism."""

import math

from knowledge_nexus_spark.functions.chunker import (
    WhitespaceTokenizer,
    char_chunks,
    clean_markdown_py,
    create_chunks,
    sentence_aware_chunks,
)
from knowledge_nexus_spark.functions.embed import cosine_py, embed_text_py

TOK = WhitespaceTokenizer()


def test_clean_markdown():
    assert clean_markdown_py("# Heading\nThis is a **test**!") == "Heading. This is a test!"


def test_create_chunks_golden():
    result = create_chunks(
        "Test Page", "2024-01-01", "This is a test content.", chunk_size=12, overlap=2, tok=TOK
    )
    assert result == [
        "Title: Test Page\nLast edited time: 2024-01-01\n\nContent:\nThis is a test",
        "Title: Test Page\nLast edited time: 2024-01-01\n\nContent:\na test content.",
    ]


def test_create_chunks_empty_content_gets_metadata_chunk():
    result = create_chunks("T", "2024-01-01", "", chunk_size=12, overlap=2, tok=TOK)
    assert result == ["Title: T\nLast edited time: 2024-01-01\n"]


def test_sentence_aware_golden():
    content = "This is a sentence. This is another one!"
    assert sentence_aware_chunks(content, 6, 2, TOK) == [
        "This is a sentence.",
        "a sentence. This is another one!",
    ]


def test_sentence_aware_no_punctuation():
    content = (
        "This is an example of a very long sentence that does not contain any "
        "punctuation marks and is intended for testing purposes"
    )
    assert sentence_aware_chunks(content, 10, 2, TOK) == [
        "This is an example of a very long sentence that",
        "sentence that does not contain any punctuation marks and is",
        "and is intended for testing purposes",
    ]


def test_sentence_aware_overlap_skipped_when_budget_too_small():
    content = "one two three four five six"
    # budget 2 ≤ overlap 3 → overlap forced to 0, plain tiling
    assert sentence_aware_chunks(content, 2, 3, TOK) == [
        "one two",
        "three four",
        "five six",
    ]


def test_char_chunks_golden():
    content = (
        "This is a test content for chunking. Here we explore bigger sentence "
        "that consists of multiple chunks."
    )
    result = char_chunks(content, 5, 2, TOK)
    assert result == [
        "This is a test content f",
        " for chunking. Here we explore bigger s",
        " sentence that consists of multiple chunks.",
    ]


def test_char_chunks_edges():
    assert char_chunks("", 5, 2, TOK) == []
    assert char_chunks("Token", 5, 2, TOK) == ["Token"]
    assert char_chunks("This is exact size.", 4, 2, TOK) == ["This is exact size."]


def test_embedding_deterministic_and_normalized():
    a = embed_text_py("graph spark knowledge", dim=64)
    b = embed_text_py("graph spark knowledge", dim=64)
    assert a == b
    assert math.isclose(sum(x * x for x in a), 1.0, rel_tol=1e-9)
    assert cosine_py(a, b) > 0.999999


def test_embedding_discriminative():
    a = embed_text_py("graph spark knowledge node edge", dim=64)
    c = embed_text_py("completely different words entirely unrelated", dim=64)
    assert cosine_py(a, c) < 0.9
    assert embed_text_py("", dim=8) == [0.0] * 8
