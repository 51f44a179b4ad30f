#!/usr/bin/env python3
"""Golden permessage-deflate interop corpus (VERDICT r10 item #6).

Direction A (foreign compressor -> our inflater): for every
server_max_window_bits in 9..15, a zlib compressobj(6, DEFLATED, -wb)
compresses the FIXED message sequence below with context takeover,
sync-flushing per message and stripping the 00 00 ff ff tail exactly as
RFC 7692 7.2.1 specifies. Empty messages exercise the
empty-after-sync-flush seam (zlib emits just the sync marker, which
strips to ZERO bytes; the wire form is then the 0x00 empty stored
block, matching what real peers send).

Direction B (our deflater -> foreign decompressor): PropertySpec pins
our PmdDeflater's exact output bytes for the same sequence; this script
VERIFIES those pinned bytes decompress to the right plaintexts with
zlib decompressobj(-15) (run `sbt "testOnly graft.PropertySpec -- -z
zlib"` to print fresh hex if the JDK's deflate output ever changes).

Output: src/test/resources/deflate_golden.txt with lines
  wb=<n> msg=<i> <hex-or-"empty">
The message sequence is reconstructed in the spec from the same
deterministic strings — keep the two definitions in sync.
"""
import sys
import zlib

OUT = "/root/repo/src/test/resources/deflate_golden.txt"

M1 = ("the quick brown fox jumps over the lazy dog " * 40).encode()


def far_ref_message() -> bytes:
    """36 KB of md5-chain filler (no accidental long repeats) followed by
    six 64-byte copies at staged back distances 700..24000 — one per
    (2^k, 2^(k+1)] band for k=9..14. A wb=9 window (512 B) resolves none
    of them, wb=10 resolves only the 700, ... wb=15 all six, so the
    seven per-window streams are pairwise DISTINCT (the original corpus
    kept every match within 512 B and was degenerate across wb —
    round-12 advice). Reconstructed identically in PropertySpec and
    graft.tools.GenDeflateOurs; keep the three definitions in sync.
    """
    import hashlib
    base = "".join(hashlib.md5(f"pmd-far-{i}".encode()).hexdigest()
                   for i in range(1125))  # 36 000 chars
    s = base
    for d in (700, 1500, 3000, 6000, 12000, 24000):
        p = len(s) - d
        s += s[p:p + 64]
    return s.encode()


MESSAGES = [M1, b"", M1 + b"tail", b"", b"the lazy dog naps " * 100,
            far_ref_message()]


def strip_tail(b: bytes) -> bytes:
    assert b.endswith(b"\x00\x00\xff\xff"), b[-8:].hex()
    body = b[:-4]
    # RFC 7692 wire form for an empty compressed payload: the 0x00
    # empty stored block (a frame must carry at least one byte)
    return body if body else b"\x00"


def gen_direction_a(fh):
    per_msg = [set() for _ in MESSAGES]
    for wb in range(9, 16):
        c = zlib.compressobj(6, zlib.DEFLATED, -wb)
        d = zlib.decompressobj(-wb)
        for i, m in enumerate(MESSAGES):
            body = strip_tail(c.compress(m) + c.flush(zlib.Z_SYNC_FLUSH))
            # self-check: the stream must round-trip in zlib itself
            assert d.decompress(body + b"\x00\x00\xff\xff") == m
            per_msg[i].add(body)
            fh.write(f"wb={wb} msg={i} {body.hex() or 'empty'}\n")
    # non-degeneracy: the far-reference message must compress differently
    # at EVERY window size, or the wb dimension isn't really exercised
    assert len(per_msg[-1]) == 7, \
        f"far-ref message degenerate: only {len(per_msg[-1])} distinct streams"


def verify_direction_b(hex_lines):
    """Feed PropertySpec's pinned PmdDeflater bytes through zlib."""
    d = zlib.decompressobj(-15)
    ok = True
    for i, hx in enumerate(hex_lines):
        body = bytes.fromhex(hx)
        got = d.decompress(body + b"\x00\x00\xff\xff")
        want = MESSAGES[i]
        status = "OK" if got == want else f"MISMATCH ({len(got)} vs {len(want)} bytes)"
        ok &= got == want
        print(f"msg={i}: {status}")
    return ok


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "verify-ours":
        # hex bodies on stdin, one per line, in MESSAGES order
        lines = [ln.strip() for ln in sys.stdin if ln.strip()]
        sys.exit(0 if verify_direction_b(lines) else 1)
    with open(OUT, "w") as fh:
        gen_direction_a(fh)
    print(f"wrote {OUT}")
