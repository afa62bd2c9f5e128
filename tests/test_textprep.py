"""Text preparation parity (reference: server/format.go)."""
from vectorsearch_tpu.engine.textprep import document_prefix, flatten, split


class TestFlatten:
    def test_null(self):
        assert flatten(None) == "null."

    def test_bools(self):
        assert flatten(True) == "true."
        assert flatten(False) == "false."

    def test_string_normalization(self):
        # CRs removed, blank runs collapsed, trailing dot ensured
        assert flatten("hello\r\nworld") == "hello\nworld."
        assert flatten("a\n\n\nb") == "a\nb."
        assert flatten("  padded  ") == "padded."
        assert flatten("ends.") == "ends."

    def test_numbers_shortest_float32(self):
        # Go strconv.FormatFloat(v, 'f', -1, 32)
        assert flatten(3.0) == "3"
        assert flatten(0.1) == "0.1"
        assert flatten(42) == "42"
        assert flatten(-2.5) == "-2.5"

    def test_array_one_line_per_item(self):
        assert flatten(["a", "b"]) == "a.\nb."

    def test_map_sorted_keys_prefixed(self):
        out = flatten({"b": "two", "a": "one"})
        assert out == "a: one.\nb: two."

    def test_nested_map_lines_all_prefixed(self):
        out = flatten({"k": ["x", "y"]})
        assert out == "k: x.\nk: y."

    def test_deep_nesting(self):
        out = flatten({"outer": {"inner": 1.5}})
        assert out == "outer: inner: 1.5"


class TestSplit:
    def test_single_small_section(self):
        out = split("", "one two three", 1000)
        assert out == [" one two three"]  # reference's space-join

    def test_prefix_on_each_section(self):
        # maxWords = ((40*9)//10)//4 = 9
        text = "\n".join(["w1 w2 w3 w4 w5"] * 4)
        out = split("Doc. ", text, 40)
        assert len(out) > 1
        assert all(s.startswith("Doc. ") for s in out)

    def test_negative_ctx_every_line_is_a_section(self):
        # noop provider: ctx = -huge -> each line becomes its own section,
        # and a non-empty prefix is flushed once first (reference quirk,
        # format.go:96-105)
        out = split("p. ", "l1\nl2", -(2**60))
        assert out[0] == "p. "
        assert out[1] == "p.  l1"
        assert out[2] == "p.  l2"

    def test_empty_prefix_negative_ctx(self):
        out = split("", "l1\nl2", -(2**60))
        assert out == [" l1", " l2"]

    def test_word_budget_respected(self):
        text = "\n".join(f"word{i} extra" for i in range(50))
        ctx = 100  # maxWords = 22
        out = split("", text, ctx)
        for section in out:
            assert len(section.split()) <= 24  # budget + one overflow line


def test_document_prefix():
    assert document_prefix("") == ""
    assert document_prefix("Title") == "Title. "
    assert document_prefix("Title.") == "Title. "
    assert document_prefix("  Spaced  ") == "Spaced. "
