"""Paginator tests — mirrors the reference's test_paginator.py coverage:
page bounds, typed search, IN-filters, sort, stable offsets."""

import pytest

from pandas_ai_spark.paginator import MAX_PAGE_SIZE, paginate

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF_SMOKE}/customer.parquet")


def test_page_size_and_offset(customer, duck):
    p1 = paginate(customer, page=1, page_size=10, sort_by="c_custkey")
    p2 = paginate(customer, page=2, page_size=10, sort_by="c_custkey")
    keys1 = [r.c_custkey for r in p1.collect()]
    keys2 = [r.c_custkey for r in p2.collect()]
    expected = [r[0] for r in duck.execute(
        "SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 20").fetchall()]
    assert keys1 == expected[:10]
    assert keys2 == expected[10:]


def test_stable_pages_without_sort(customer):
    """No sort requested → canonical all-column order keeps pages disjoint
    and reproducible."""
    a = {r.c_custkey for r in paginate(customer, 1, 20).collect()}
    b = {r.c_custkey for r in paginate(customer, 2, 20).collect()}
    a2 = {r.c_custkey for r in paginate(customer, 1, 20).collect()}
    assert a == a2
    assert not (a & b)


def test_search_string_ilike(customer, duck):
    got = paginate(customer, 1, 100, search="Customer#000000100")
    exp = duck.execute(
        "SELECT count(*) FROM customer WHERE "
        "lower(c_name) LIKE '%customer#000000100%' OR "
        "lower(c_mktsegment) LIKE '%customer#000000100%'").fetchone()[0]
    assert got.count() == exp


def test_search_numeric_equality(customer):
    got = paginate(customer, 1, 100, search="42")
    # matches rows where ANY numeric column equals 42 or a string contains it
    assert got.count() >= 1
    assert got.where("c_custkey = 42").count() == 1


def test_filters_in_list(customer):
    got = paginate(customer, 1, 100,
                   filters={"c_mktsegment": ["BUILDING", "MACHINERY"]})
    vals = {r.c_mktsegment for r in got.collect()}
    assert vals <= {"BUILDING", "MACHINERY"}


def test_filters_unknown_column(customer):
    with pytest.raises(ValueError, match="Unknown filter column"):
        paginate(customer, 1, 10, filters={"nope": [1]})


def test_sort_desc(customer):
    got = [r.c_acctbal for r in
           paginate(customer, 1, 5, sort_by="c_acctbal",
                    sort_order="desc").collect()]
    assert got == sorted(got, reverse=True)


def test_page_size_clamped(customer):
    assert paginate(customer, 1, 5000).count() == MAX_PAGE_SIZE


def test_page_must_be_positive(customer):
    with pytest.raises(ValueError, match="page"):
        paginate(customer, 0, 10)
