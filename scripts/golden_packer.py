#!/usr/bin/env python3
"""Golden-trace generator for the chunk packers.

Independently re-derives the reference's packing semantics (transcribed from
/root/reference/airflow-pipeline/dags/pipeline1.py:75-104, 109-188, 190-253 —
semantics only, structured differently) using the ENGINE tokenizer
(graft.functions.TextFunctions.TokenRegex), and dumps expected outputs for the
ScalaTest golden specs into src/test/resources/golden/.
"""
import json, os, re, sys

TOKEN_RE = re.compile(r"\w+|[^\w\s]")

def ntok(s):
    return len(TOKEN_RE.findall(s))

def pack_lines(lines, delim, limit):
    """C1: greedy packer with reference quirks (leading delim on fresh
    buffer; delimiter-less fit test; empty-buffer flush on exact-limit line)."""
    out, aside, buf = [], [], ""
    for raw in lines:
        ln = raw.strip()
        if not ln:
            continue
        if ntok(ln) > limit:
            aside.append(ln)
            if buf:
                out.append(buf)
                buf = ""
        elif ntok(buf + ln) < limit:
            buf = buf + delim + ln
        else:
            out.append(buf)  # even when buf == ""
            buf = ln
    if buf:
        out.append(buf)
    return out, aside

def pack_pypdf(lines, limit):
    """C1+C2: line pass with '\\n', then oversized lines re-packed word-wise."""
    first, aside = pack_lines(lines, "\n", limit)
    extra = []
    if aside:
        words = [w for ln in aside for w in ln.strip().split()]
        extra, _ = pack_lines(words, " ", limit)
    return first, extra

def clean_mmd(s):
    for pat in (r"\\begin\{tabular\}.*?\n", r"\\end\{tabular\}.*?\n",
                r"\\begin\{table\}.*?\n", r"\\end\{table\}.*?\n"):
        s = re.sub(pat, "\n", s)
    return re.sub(r"\+\+\+(.*?)\+\+\+", "\n", s, flags=re.DOTALL)

def classify(p):
    for prefix, label in (("###", "Heading3"), ("##", "Heading2"), ("#", "Heading1"),
                          ("**", "Bold"), ("*", "Bullet")):
        if p.startswith(prefix):
            return label
    return "Paragraph"

def paragraphs(form, mmd):
    rows, cum = [], 0
    for i, p in enumerate(clean_mmd(mmd).split("\n")):
        if len(p) == 0:
            continue
        t = ntok(p)
        cum += t
        rows.append(dict(formName=form, paraNumber=i, paraContent=p,
                         paraCharacterCount=len(p), paraSemantics=classify(p),
                         tokenCount=t, cumulativeTokenCount=cum))
    sec, seen = 0, False
    for r in rows:
        heading = r["paraSemantics"] in ("Heading1", "Heading2", "Heading3")
        if heading:
            seen = True
            sec += 1
        elif not seen:
            sec += 1
        r["section"] = sec
    return rows

def sections(rows):
    out, cum = [], 0
    bysec = {}
    for r in rows:
        bysec.setdefault(r["section"], []).append(r)
    for sec in sorted(bysec):
        chunk = "\n".join(r["paraContent"] for r in sorted(bysec[sec], key=lambda r: r["paraNumber"]))
        t = ntok(chunk)
        cum += t
        out.append(dict(section=sec, chunk=chunk, tokenCount=t, cumulativeTokenCount=cum))
    return out

def pack_sections(secs, limit):
    """C3: buffer token count re-derived from the buffer after every step."""
    out, aside, buf, buft = [], [], "", 0
    for s in secs:
        if s["tokenCount"] > limit:
            aside.append(s["chunk"])
            if buf:
                out.append(buf)
                buf = ""
        elif s["tokenCount"] + buft < limit:
            buf = buf + "\n" + s["chunk"]
        else:
            out.append(buf)  # even when empty
            buf = s["chunk"]
        buft = ntok(buf)
    if buf:
        out.append(buf)
    return out, aside

def split_oversized(section, limit):
    """C4: heading held out and prefixed (no separator) to each emitted chunk."""
    sents = [x.strip() for x in section.split("\n") if x.strip()]
    heading = ""
    if sents and sents[0].startswith("#"):
        heading, sents = sents[0], sents[1:]
    out, buf, buft = [], heading, 0
    for s in sents:
        if ntok(s) + buft < limit:
            buf = buf + "\n" + s
        else:
            out.append(buf)
            buf = heading + s
        buft = ntok(buf)
    if buf:
        out.append(buf)
    return out

def pack_nougat(form, mmd, limit):
    first, aside = pack_sections(sections(paragraphs(form, mmd)), limit)
    for sec in aside:
        first = first + split_oversized(sec, limit)
    return first

FIXTURES = {
    "docA": "Opening paragraph about query engines.\n\nSecond paragraph with filters and joins here.\n\nThird paragraph mentions aggregation pipelines.\n\nA fourth one; short.\n",
    "docB": "Intro line before any heading.\nAnother pre-heading paragraph.\n# Title One\nBody paragraph under title one.\n** bolded remark\n## Sub Title\n* bullet point one\n* bullet point two\nClosing body text.\n### Deep Title\nDeep body.\n",
    "docC": "Before table.\n\\begin{table} junk header\n\\begin{tabular}{cc} a & b \\\\ c & d\n\\end{tabular} trailing\n\\end{table} more\nAfter table.\n+++ warning span\nstill warning +++\nFinal paragraph.\n",
    "docD": ("# Big Section\n" + "\n".join(f"sentence number {i} with several words inside it." for i in range(12)) + "\n\none two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo twentythree twentyfour twentyfive twentysix twentyseven twentyeight twentynine thirty thirtyone thirtytwo thirtythree thirtyfour thirtyfive thirtysix thirtyseven thirtyeight thirtynine forty fortyone fortytwo fortythree fortyfour fortyfive fortysix fortyseven fortyeight fortynine fifty fiftyone fiftytwo\n"),
}
LIMIT = 50

def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    golden = {}
    for name, text in FIXTURES.items():
        lines = text.splitlines(keepends=False)
        first, extra = pack_pypdf(lines, LIMIT)
        golden[name] = {
            "tokenLimit": LIMIT,
            "text": text,
            "pypdf_first": first,
            "pypdf_second": extra,
            "paragraphs": paragraphs(name, text),
            "sections": sections(paragraphs(name, text)),
            "nougat_chunks": pack_nougat(name, text, LIMIT),
        }
    with open(os.path.join(outdir, "packer_golden.json"), "w") as f:
        json.dump(golden, f, indent=1)
    n = sum(len(g["pypdf_first"]) + len(g["nougat_chunks"]) for g in golden.values())
    print(f"wrote {outdir}/packer_golden.json ({len(golden)} docs, {n} chunks)")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/golden")
