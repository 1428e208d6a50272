"""Frontend consistency checks (no browser in this image): the JS's DOM
references, API routes, and response fields must line up with index.html
and the server contract."""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRONTEND = os.path.join(ROOT, "vqa_tpu", "frontend")


def _read(name):
    with open(os.path.join(FRONTEND, name), encoding="utf-8") as f:
        return f.read()


def test_js_element_ids_exist_in_html():
    html = _read("index.html")
    js = _read("script.js")
    html_ids = set(re.findall(r'id="([^"]+)"', html))
    js_ids = set(re.findall(r'el\("([^"]+)"\)', js))
    js_ids |= set(re.findall(r'getElementById\("([^"]+)"\)', js))
    missing = js_ids - html_ids
    assert not missing, f"script.js references missing element ids: {missing}"


def test_js_routes_match_server_contract():
    js = _read("script.js")
    # endpoints used by the page exist on the server
    from vqa_tpu.serving.server import VQAServer  # noqa: F401

    assert "/health" in js and "/predict" in js
    # response fields the JS renders are produced by the engine formatter
    for field in ("top_answer", "confidence", "answers", "probability"):
        assert field in js


def test_html_references_real_assets():
    html = _read("index.html")
    for asset in re.findall(r'(?:href|src)="([^"]+)"', html):
        if asset.startswith("http"):
            continue
        assert os.path.exists(os.path.join(FRONTEND, asset)), asset


def test_css_classes_used_by_js_exist():
    js = _read("script.js")
    css = _read("style.css")
    toggled = set(re.findall(r'classList\.(?:add|toggle)\("([^"]+)"', js))
    for cls in toggled:
        assert f".{cls}" in css, f"JS toggles class '{cls}' missing from CSS"
