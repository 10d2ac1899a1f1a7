"""Minimal parsec-API-compatible shim (the real `parsec` package is
not installed in this sandbox).  Implements exactly the subset the
reference's grammars use, with the real library's semantics:

  - Parser wraps fn(text, index) -> Value
  - `^` try_choice (backtrack to the original index on ANY failure)
  - `|` choice (second tried only if first failed without consuming)
  - `>>`, `<<`, `+` sequencing; parsecmap; optional; spaces; many1;
    sepBy1; regex; string; @generate; parse (prefix) / parse_strict
    (must consume all input)

This file exists ONLY to execute the reference's grammar definitions
as a differential-testing oracle; the engine itself never imports it.
"""

from __future__ import annotations

import re as _re
from collections import namedtuple

Value = namedtuple("Value", "status index value expected")


def _success(index, value):
    return Value(True, index, value, None)


def _failure(index, expected):
    return Value(False, index, None, expected)


Value.success = staticmethod(_success)
Value.failure = staticmethod(_failure)


class ParseError(Exception):
    pass


class Parser:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, text, index=0):
        return self.fn(text, index)

    # --- running ---------------------------------------------------------

    def parse(self, text):
        res = self(text, 0)
        if not res.status:
            raise ParseError(f"expected {res.expected} at {res.index}")
        return res.value

    def parse_strict(self, text):
        res = self(text, 0)
        if not res.status or res.index != len(text):
            raise ParseError(f"incomplete parse at {res.index}")
        return res.value

    # --- combinators -------------------------------------------------------

    def parsecmap(self, f):
        def fn(text, index):
            res = self(text, index)
            if not res.status:
                return res
            return Value.success(res.index, f(res.value))
        return Parser(fn)

    def __xor__(self, other):  # try_choice: full backtracking
        def fn(text, index):
            res = self(text, index)
            if res.status:
                return res
            return other(text, index)
        return Parser(fn)

    def __or__(self, other):  # choice: no backtrack after consumption
        def fn(text, index):
            res = self(text, index)
            if res.status or res.index != index:
                return res
            return other(text, index)
        return Parser(fn)

    def __rshift__(self, other):  # >> keep right
        def fn(text, index):
            res = self(text, index)
            if not res.status:
                return res
            return other(text, res.index)
        return Parser(fn)

    def __lshift__(self, other):  # << keep left
        def fn(text, index):
            res = self(text, index)
            if not res.status:
                return res
            res2 = other(text, res.index)
            if not res2.status:
                return res2
            return Value.success(res2.index, res.value)
        return Parser(fn)

    def __add__(self, other):  # + joint -> tuple
        def fn(text, index):
            res = self(text, index)
            if not res.status:
                return res
            res2 = other(text, res.index)
            if not res2.status:
                return res2
            return Value.success(res2.index, (res.value, res2.value))
        return Parser(fn)


def regex(pattern, flags=0):
    if isinstance(pattern, str):
        rx = _re.compile(pattern, flags)
    else:
        rx = pattern

    def fn(text, index):
        m = rx.match(text, index)
        if m:
            return Value.success(m.end(), m.group(0))
        return Value.failure(index, rx.pattern)
    return Parser(fn)


def string(s):
    def fn(text, index):
        if text.startswith(s, index):
            return Value.success(index + len(s), s)
        return Value.failure(index, repr(s))
    return Parser(fn)


def optional(p, default_value=None):
    def fn(text, index):
        res = p(text, index)
        if res.status:
            return res
        return Value.success(index, default_value)
    return Parser(fn)


def spaces():
    return regex(r"\s*")


def many1(p):
    def fn(text, index):
        res = p(text, index)
        if not res.status:
            return res
        values = [res.value]
        index = res.index
        while True:
            res = p(text, index)
            if not res.status or res.index == index:
                break
            values.append(res.value)
            index = res.index
        return Value.success(index, values)
    return Parser(fn)


def sepBy1(p, sep):
    def fn(text, index):
        res = p(text, index)
        if not res.status:
            return res
        values = [res.value]
        index = res.index
        while True:
            s = sep(text, index)
            if not s.status:
                break
            res = p(text, s.index)
            if not res.status:
                break
            values.append(res.value)
            index = res.index
        return Value.success(index, values)
    return Parser(fn)


def generate(fn):
    """@generate decorator: generator-based sequential parsing."""
    def parser_fn(text, index):
        gen = fn()
        value = None
        try:
            while True:
                p = gen.send(value)
                res = p(text, index)
                if not res.status:
                    return res
                value = res.value
                index = res.index
        except StopIteration as stop:
            return Value.success(index, stop.value)
    return Parser(parser_fn)
