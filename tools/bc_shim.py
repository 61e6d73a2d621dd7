#!/usr/bin/env python
"""Minimal GNU bc substitute for reference jasper.sh's QV math (this image
ships no `bc`). Supports exactly the shapes jasper.sh pipes in
(src/jasper.sh:238-256):

    scale=N; <arith expr with + - * / ( ) unary->
    ... | bc -l  adds mathlib names l() (natural log) and e() (exp)
    <expr> > <expr>   prints 1/0

bc semantics honored: arbitrary-precision Decimal arithmetic; DIVISION
truncates (not rounds) to `scale` fractional digits; mathlib l()/e()
computed at high precision then truncated to scale.

Install as an executable named `bc` on PATH (tools/race_reference.py does)."""

import sys
from decimal import Decimal, getcontext


def _trunc(x: Decimal, scale: int) -> Decimal:
    q = Decimal(1).scaleb(-scale)
    return x.quantize(q, rounding="ROUND_DOWN") if scale >= 0 else x


class BC:
    def __init__(self):
        self.scale = 0
        getcontext().prec = 120

    # -- recursive-descent parser over a token list ------------------------
    def tokens(self, s):
        out, i = [], 0
        while i < len(s):
            c = s[i]
            if c.isspace():
                i += 1
            elif c.isdigit() or c == ".":
                j = i
                while j < len(s) and (s[j].isdigit() or s[j] == "."):
                    j += 1
                out.append(("num", Decimal(s[i:j])))
                i = j
            elif c.isalpha():
                j = i
                while j < len(s) and s[j].isalnum():
                    j += 1
                out.append(("name", s[i:j]))
                i = j
            elif s[i : i + 2] in (">=", "<=", "==", "!="):
                out.append(("op", s[i : i + 2]))
                i += 2
            else:
                out.append(("op", c))
                i += 1
        return out

    def eval(self, s: str):
        self.t = self.tokens(s)
        self.p = 0
        v = self.rel()
        return v

    def peek(self):
        return self.t[self.p] if self.p < len(self.t) else ("end", "")

    def take(self):
        tok = self.peek()
        self.p += 1
        return tok

    def rel(self):
        left = self.expr()
        kind, op = self.peek()
        if kind == "op" and op in (">", "<", ">=", "<=", "==", "!="):
            self.take()
            right = self.expr()
            res = {
                ">": left > right, "<": left < right,
                ">=": left >= right, "<=": left <= right,
                "==": left == right, "!=": left != right,
            }[op]
            return Decimal(1 if res else 0)
        return left

    def expr(self):
        v = self.term()
        while True:
            kind, op = self.peek()
            if kind == "op" and op in "+-":
                self.take()
                w = self.term()
                v = v + w if op == "+" else v - w
            else:
                return v

    def term(self):
        v = self.unary()
        while True:
            kind, op = self.peek()
            if kind == "op" and op in "*/":
                self.take()
                w = self.unary()
                if op == "*":
                    v = v * w
                else:
                    v = _trunc(v / w, self.scale)
            else:
                return v

    def unary(self):
        kind, op = self.peek()
        if kind == "op" and op == "-":
            self.take()
            return -self.unary()
        return self.atom()

    def atom(self):
        kind, val = self.take()
        if kind == "num":
            return val
        if kind == "op" and val == "(":
            v = self.rel()
            self.take()  # ')'
            return v
        if kind == "name":
            k2, v2 = self.peek()
            if k2 == "op" and v2 == "(":
                self.take()
                arg = self.rel()
                self.take()  # ')'
                return self.call(val, arg)
            raise ValueError(f"unknown name {val}")
        raise ValueError(f"unexpected token {kind} {val}")

    def call(self, name, arg: Decimal):
        if name == "l":
            if arg <= 0:
                raise ValueError("l() domain")
            return _trunc(Decimal(arg).ln(), self.scale)
        if name == "e":
            return _trunc(Decimal(arg).exp(), self.scale)
        if name == "sqrt":
            return _trunc(Decimal(arg).sqrt(), self.scale)
        raise ValueError(f"unknown function {name}")

    def run_line(self, line: str):
        out = []
        for stmt in line.split(";"):
            stmt = stmt.strip()
            if not stmt:
                continue
            if stmt.startswith("scale") and "=" in stmt and not stmt.startswith("scale=="):
                self.scale = int(stmt.split("=", 1)[1])
                continue
            v = self.eval(stmt)
            s = format(v.normalize() if v == v.to_integral_value() else v, "f")
            # bc prints integers without decimals, fractions per scale
            if v == v.to_integral_value() and "." in s:
                s = s.split(".")[0]
            out.append(s)
        return out


def main():
    bc = BC()
    for line in sys.stdin:
        try:
            for s in bc.run_line(line):
                print(s)
        except Exception:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
