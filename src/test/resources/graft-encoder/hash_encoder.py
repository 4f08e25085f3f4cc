#!/usr/bin/env python3
"""Dependency-free deterministic text encoder speaking the
SubprocessEmbedding protocol (stdin: one base64(UTF-8 text) line per
object; stdout: `dims` space-separated floats per line, flushed).

FNV-1a token hashing with hash-sign weights, L2-normalized — the same
family as graft.objects.HashTextEmbedding, but implemented independently
so the test exercises the PROCESS contract, not a shared code path.

Magic input "__die__" exits the process (spec uses it to cover
restart-after-death).
"""
import base64
import sys

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 16

for line in sys.stdin:
    # EVERY line is a request and must get exactly one response line —
    # base64("") is the empty string, so an empty line means empty text,
    # and skipping it would desync the strict request/response protocol
    # (the adapter would block forever on the missing reply).
    line = line.strip()
    text = base64.b64decode(line).decode("utf-8") if line else ""
    if text == "__die__":
        sys.exit(3)
    v = [0.0] * dims
    for tok in text.split():
        h = 0xCBF29CE484222325
        for b in tok.encode("utf-8"):
            h ^= b
            h = (h * 0x100000001B3) % (1 << 64)
        v[h % dims] += 1.0 if ((h >> 32) & 1) == 0 else -1.0
    n = sum(x * x for x in v) ** 0.5
    if n > 0:
        v = [x / n for x in v]
    print(" ".join(f"{x:.9e}" for x in v), flush=True)
