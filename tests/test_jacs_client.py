"""JACS REST client tests against an in-process HTTP server.

The reference's Jersey client (cmd/jacsdata/*, cmd/HttpHelper.java) has
no tests; here the paging, auth-header, retry, and entity-mapping
behavior is pinned with a stdlib http.server fake serving
/data/colorDepthMIPsWithSamples pages.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from colormipsearch_tpu.jacs import (CachedDataHelper, ColorDepthMIP,
                                     JacsClient, em_neuron_from_mip,
                                     lm_neuron_from_mip)
from colormipsearch_tpu.model import ComputeFileType, Gender

EM_MIPS = [
    {"id": f"em-{i}", "name": f"body{i}", "filepath": f"/store/em{i}.tif",
     "alignmentSpace": "JRC2018_Unisex_20x_HR", "bodyId": 1000 + i,
     "neuronType": "KC", "neuronInstance": f"KC_{i}", "emBodyRef": f"ref-{i}",
     "emBody": {"datasetIdentifier": "hemibrain:v1.2.1",
                "neuronTerms": ["KC", "ab"],
                "files": {"SkeletonSWC": f"/swc/{i}.swc"}}}
    for i in range(5)
]

LM_MIP = {
    "id": "lm-1", "name": "line1", "filepath": "/store/lm1.tif",
    "alignmentSpace": "JRC2018_Unisex_20x_HR", "sampleRef": "Sample#77",
    "anatomicalArea": "Brain", "objective": "40x",
    "sample": {"line": "GMR_X", "publishingName": "R12A34",
               "slideCode": "20200101_31_A1", "gender": "f",
               "releaseLabel": "Gen1 GAL4"},
}

# refs WITHOUT embedded docs: JACS returns these when the join is not
# materialized; the client must hydrate via /data/samples /emdata/emBodies
BARE_LM_MIP = {
    "id": "lm-2", "name": "line2", "filepath": "/store/lm2.tif",
    "alignmentSpace": "JRC2018_Unisex_20x_HR", "sampleRef": "Sample#88",
    "anatomicalArea": "VNC", "objective": "20x",
}
BARE_EM_MIP = {
    "id": "em-9", "name": "body9", "filepath": "/store/em9.tif",
    "alignmentSpace": "JRC2018_Unisex_20x_HR", "bodyId": 1009,
    "emBodyRef": "EMBody#99",
}
SAMPLE_DOCS = [{"_id": "88", "line": "GMR_Y", "publishingName": "R56B78",
                "slideCode": "20210101_1_B2", "gender": "m",
                "releaseLabel": "Gen1 MCFO"}]
BODY_DOCS = [{"_id": "99", "datasetIdentifier": "hemibrain:v1.2.1",
              "neuronTerms": ["PN"], "files": {"SkeletonSWC": "/swc/9.swc"}}]


class _Handler(BaseHTTPRequestHandler):
    fail_first = 0   # class-level: number of 500s before succeeding
    seen_auth = []

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        type(self).seen_auth.append(self.headers.get("Authorization"))
        if type(self).fail_first > 0:
            type(self).fail_first -= 1
            self.send_response(500)
            self.end_headers()
            return
        if u.path == "/data/colorDepthMIPsWithSamples":
            if "id" in q:  # id-set fetch (JacsDataGetter.httpRetrieveCDMIPs)
                ids = set(q["id"].split(","))
                page = [d for d in EM_MIPS + [LM_MIP, BARE_LM_MIP,
                                              BARE_EM_MIP]
                        if d["id"] in ids]
            else:
                lib = q.get("libraryName")
                offset = int(q.get("offset", 0))
                length = int(q.get("length", 10000))
                data = EM_MIPS if lib == "flyem_hemibrain" else [LM_MIP]
                page = data[offset:offset + length]
            body = json.dumps(page).encode()
        elif u.path == "/data/samples":
            refs = set(q.get("refs", "").split(","))
            page = [d for d in SAMPLE_DOCS if f"Sample#{d['_id']}" in refs]
            body = json.dumps(page).encode()
        elif u.path == "/emdata/emBodies":
            refs = set(q.get("refs", "").split(","))
            page = [d for d in BODY_DOCS if f"EMBody#{d['_id']}" in refs]
            body = json.dumps(page).encode()
        elif u.path == "/data/colorDepthMIPsCount":
            body = b"5"
        elif u.path == "/cdm_library":
            body = json.dumps({"config": {
                "flyem_hemibrain": {"name": "FlyEM_Hemibrain_v1.2.1"},
                "flylight_splitgal4": {"name": "FlyLight Split-GAL4"},
            }}).encode()
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def jacs_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.seen_auth = []
    _Handler.fail_first = 0
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_paged_retrieval_and_mapping(jacs_server):
    client = JacsClient(jacs_server, authorization="Bearer tok",
                        page_size=2)  # force 3 pages
    mips = client.retrieve_color_depth_mips_with_samples(
        "flyem_hemibrain", "JRC2018_Unisex_20x_HR")
    assert [m.id for m in mips] == [f"em-{i}" for i in range(5)]
    assert all(a == "Bearer tok" for a in _Handler.seen_auth)

    e = em_neuron_from_mip(mips[0], "flyem_hemibrain", "JRC2018_Unisex_20x_HR")
    assert e.published_name == "1000"
    assert e.neuron_type == "KC" and e.neuron_instance == "KC_0"
    assert e.source_ref_id == "ref-0"
    assert "hemibrain:v1.2.1" in e.dataset_labels
    assert e.compute_files[ComputeFileType.SkeletonSWC].file_name == "/swc/0.swc"
    assert e.compute_files[ComputeFileType.SourceColorDepthImage].file_name \
        == "/store/em0.tif"

    assert client.count_color_depth_mips(
        "flyem_hemibrain", "JRC2018_Unisex_20x_HR") == 5


def test_lm_mapping(jacs_server):
    client = JacsClient(jacs_server)
    mips = client.retrieve_color_depth_mips_with_samples(
        "flylight_gen1_mcfo", "JRC2018_Unisex_20x_HR")
    e = lm_neuron_from_mip(mips[0], "flylight_gen1_mcfo",
                           "JRC2018_Unisex_20x_HR")
    assert e.published_name == "R12A34"
    assert e.internal_line_name == "GMR_X"
    assert e.slide_code == "20200101_31_A1"
    assert e.gender == Gender.f
    assert e.objective == "40x" and e.anatomical_area == "Brain"
    assert "Gen1 GAL4" in e.dataset_labels


def test_retry_then_success(jacs_server):
    _Handler.fail_first = 2
    client = JacsClient(jacs_server, retries=3)
    client._get = client._get  # default path; retry inside http_get_json
    mips = client.retrieve_color_depth_mips_with_samples(
        "flyem_hemibrain", "JRC2018_Unisex_20x_HR")
    assert len(mips) == 5  # two 500s absorbed by retries


def test_cached_data_helper():
    helper = CachedDataHelper()
    helper.cache_mips([ColorDepthMIP(id="m1", name="x")])
    assert helper.get_color_depth_mip("m1").name == "x"
    assert helper.get_color_depth_mip("nope") is None
    helper.set_library_name_mapping({"internal_lib": "Published Lib"})
    assert helper.get_library_name("internal_lib") == "Published Lib"
    assert helper.get_library_name("other") == "other"


def test_cli_jacs_import(jacs_server, tmp_path):
    from colormipsearch_tpu.cmd.main import main
    out = tmp_path / "em_mips.json"
    rc = main(["createColorDepthSearchDataInput",
               "--library", "flyem_hemibrain",
               "--jacs-url", jacs_server,
               "--authorization", "Bearer tok",
               "--output-filename", str(out)])
    assert rc == 0
    docs = json.load(open(out))
    assert len(docs) == 5
    assert docs[0]["publishedName"] == "1000"
    assert docs[0]["libraryName"] == "flyem_hemibrain"


def test_live_cached_data_helper(jacs_server):
    """LIVE CachedDataHelper: id-set fetch, read-batch-size batching,
    fetch-once caching (CachedDataHelper.cacheCDMIPs +
    JacsDataGetter.httpRetrieveCDMIPs)."""
    client = JacsClient(jacs_server, authorization="Bearer t")
    helper = CachedDataHelper(client, read_batch_size=2)
    n_before = len(_Handler.seen_auth)
    helper.prefetch(["em-0", "em-1", "em-2", "lm-1", "em-0"])
    # 4 distinct ids at batch size 2 -> 2 requests
    assert len(_Handler.seen_auth) - n_before == 2
    assert helper.get("em-1").name == "body1"
    assert helper.get("lm-1").sample.publishing_name == "R12A34"
    # already cached: no further requests
    n = len(_Handler.seen_auth)
    helper.prefetch(["em-1", "lm-1"])
    assert len(_Handler.seen_auth) == n
    assert helper.get("nope") is None


def test_library_name_mapping(jacs_server):
    from colormipsearch_tpu.jacs.client import retrieve_library_name_mapping
    m = retrieve_library_name_mapping(jacs_server)
    assert m["flyem_hemibrain"] == "FlyEM_Hemibrain_v1.2.1"


def test_export_live_jacs_enrichment(jacs_server, tmp_path):
    """exportData --jacs-url enriches exported neurons from the live
    service exactly like the offline fixture path."""
    import argparse
    from colormipsearch_tpu.cmd.exportdata_cmd import (
        _load_jacs_mips_fixture, _prefetch_jacs_mips, neuron_metadata)
    from colormipsearch_tpu.model import EMNeuronEntity

    args = argparse.Namespace(jacs_mips_file=None, jacs_url=jacs_server,
                              authorization=None, jacs_read_batch_size=10)
    helper = _load_jacs_mips_fixture(args)
    assert helper is not None
    e = EMNeuronEntity(entity_id=5, mip_id="em-3",
                       library_name="flyem_test")
    _prefetch_jacs_mips(helper, [e])
    meta = neuron_metadata(e, None, None, None, None, jacs_mips=helper)
    assert meta.get("publishedName") == "1003"
    assert meta.get("neuronType") == "KC"


def test_cached_helper_hydrates_bare_refs(jacs_server):
    """ADVICE r2 medium: MIPs returned with sampleRef/emBodyRef but no
    embedded docs must be hydrated via /data/samples and
    /emdata/emBodies (JacsDataGetter.retrieveCDMIPs:126-151), so export
    enrichment fields are not silently None."""
    client = JacsClient(jacs_server)
    helper = CachedDataHelper(client, read_batch_size=10)
    helper.prefetch(["lm-2", "em-9", "lm-1"])
    lm2 = helper.get("lm-2")
    assert lm2.sample is not None
    assert lm2.lm_line_name() == "R56B78"
    assert lm2.lm_slide_code() == "20210101_1_B2"
    em9 = helper.get("em-9")
    assert em9.em_body is not None
    assert em9.em_dataset() == "hemibrain:v1.2.1"
    assert em9.em_terms() == ["PN"]
    # embedded docs untouched
    assert helper.get("lm-1").sample.publishing_name == "R12A34"
