"""Parity with reference tests/test_name_sanitizer.py:15-81."""

from pandera_forge_spark.sanitizer import sanitize_class_name, sanitize_column_name


def test_spaces():
    assert sanitize_column_name("Column With Spaces") == ("Column_With_Spaces", False)


def test_valid_passthrough():
    assert sanitize_column_name("valid_name") == ("valid_name", True)


def test_int_name():
    assert sanitize_column_name(123) == ("col_123", False)


def test_float_name():
    assert sanitize_column_name(45.67) == ("col_45_67", False)


def test_keyword():
    assert sanitize_column_name("class") == ("col_class", False)


def test_empty():
    assert sanitize_column_name("") == ("col_unnamed", False)


def test_special_chars():
    name, ok = sanitize_column_name("!@#$%")
    assert not ok
    assert name.isidentifier()


def test_digit_leading():
    assert sanitize_column_name("123col") == ("col_123col", False)


def test_hyphens():
    assert sanitize_column_name("column-with-hyphens") == ("column_with_hyphens", False)


def test_class_digit_leading():
    assert sanitize_class_name("123Model") == "Model123Model"


def test_class_empty():
    assert sanitize_class_name("") == "DataFrameModel"


def test_class_specials():
    assert sanitize_class_name("My Table!") == "My_Table_"
