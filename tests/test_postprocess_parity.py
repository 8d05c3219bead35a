"""X6 parity: engine post_process_markdown vs a literal transcription of the
reference walker (scraper.py:543-662), property-tested on generated
markdown-ish inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from eget_spark.functions.html import post_process_markdown


def reference_post_process(markdown: str) -> str:
    """Line-for-line behavioral transcription of the reference
    _post_process_markdown (kept in the test so the engine implementation
    can be refactored freely)."""
    markdown = re.sub(r"<!--.*?-->", "", markdown, flags=re.DOTALL)
    markdown = markdown.replace("&nbsp;", " ").replace("\xa0", " ").replace(" ", " ")
    markdown = re.sub(r"(#{1,6})([^#\s])", r"\1 \2", markdown)
    markdown = re.sub(r"(\n\s*)-([^\s])", r"\1- \2", markdown)
    markdown = re.sub(r"[ \t]+$", "", markdown, flags=re.MULTILINE)

    lines = markdown.split("\n")
    processed = []
    in_code_block = False
    in_list = False
    for line in lines:
        line = line.rstrip()
        if line.startswith("```"):
            in_code_block = not in_code_block
            processed.append(line)
            continue
        if in_code_block:
            processed.append(line)
            continue
        if not line.strip():
            if processed and processed[-1].strip():
                processed.append("")
            continue
        if line.startswith("#"):
            if processed and processed[-1].strip():
                processed.append("")
            processed.append(line)
            processed.append("")
            in_list = False
            continue
        if line.strip().startswith(("-", "*", "+")) or re.match(r"^\s*\d+\.", line):
            if not in_list and processed and processed[-1].strip():
                processed.append("")
            processed.append(line)
            in_list = True
            continue
        else:
            in_list = False
        if line.strip().startswith("!["):
            if processed and processed[-1].strip():
                processed.append("")
            processed.append(line)
            processed.append("")
            continue
        processed.append(line)
    markdown = "\n".join(processed)
    markdown = re.sub(r"\n{3,}", "\n\n", markdown)
    markdown = re.sub(r"^\s*[\*\.\-]\s*$", "", markdown, flags=re.MULTILINE)
    markdown = re.sub(r"\n{3,}", "\n\n", markdown)
    markdown = re.sub(r"\*\*Copy\n\[code\]", "Copy\n\n```", markdown)
    markdown = re.sub(r"\[/code\]", "```", markdown)
    markdown = re.sub(r"\[code\]", "```", markdown)
    markdown = re.sub(r"^\s*[\*\.\-]\s*$", "", markdown, flags=re.MULTILINE)
    markdown = re.sub(r"\n{3,}", "\n\n", markdown)
    markdown = re.sub(
        r"(\n*)(```[\w]*\n.*?\n```)(\n*)", r"\n\n\2\n\n", markdown, flags=re.DOTALL
    )
    markdown = re.sub(r"(\n*)(!\[.*?\]\(.*?\))(\n*)", r"\n\n\2\n\n", markdown)
    markdown = re.sub(r"\n{3,}", "\n\n", markdown)
    markdown = re.sub(r"^\s*\*\s*$", "", markdown, flags=re.MULTILINE)
    markdown = re.sub(r"\n{3,}", "\n\n", markdown)
    return markdown.strip()


_md_line = st.one_of(
    st.just(""),
    st.just("```"),
    st.just("```python"),
    st.just("[code]"),
    st.just("[/code]"),
    st.just("**Copy"),
    st.just("*"),
    st.just(" - "),
    st.just("![alt](ref)"),
    st.builds(lambda n, t: "#" * n + t, st.integers(1, 7), st.sampled_from(["x", " y", "#z"])),
    st.builds(lambda t: "- " + t, st.text("ab c", max_size=8)),
    st.builds(lambda t: "-" + t, st.text("ab", min_size=1, max_size=6)),
    st.builds(lambda n, t: f"{n}. {t}", st.integers(1, 9), st.text("ab", max_size=6)),
    st.text("abc &nbsp;\xa0<!-->", max_size=20),
)


@given(st.lists(_md_line, max_size=25))
@settings(max_examples=300, deadline=None)
def test_post_process_matches_reference(lines):
    md = "\n".join(lines)
    assert post_process_markdown(md) == reference_post_process(md)
