"""HTTP serving API tests (WSGI, no network needed)."""
import io
import json
import shutil

import numpy as np
import pytest

from pianobart_tpu.serve.app import create_app
from pianobart_tpu.midi.writer import midi_bytes
from tests.test_midi_io import make_song


def wsgi_call(app, method, path, body=b"", content_type=None):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "wsgi.input": io.BytesIO(body),
        "CONTENT_LENGTH": str(len(body)),
    }
    if content_type:
        environ["CONTENT_TYPE"] = content_type
    out = b"".join(app(environ, start_response))
    return captured["status"], captured["headers"], out


def multipart(field, filename, data):
    boundary = "XtestX"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{field}"; filename="{filename}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n"
            ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


@pytest.fixture
def app(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)

    def fake_generate(midi_in, midi_out, seed=0):
        shutil.copyfile(midi_in, midi_out)  # echo "model"
        return True

    return create_app(generate_fn=fake_generate)


def test_health(app):
    status, _, body = wsgi_call(app, "GET", "/api/health")
    assert status == "200 OK"
    j = json.loads(body)
    assert j["status"] == "ok" and j["model_loaded"] is False


def test_index_page(app):
    status, headers, body = wsgi_call(app, "GET", "/")
    assert status == "200 OK"
    assert b"pianobart_tpu" in body


def test_upload_generate_download_roundtrip(app, rng):
    data = midi_bytes(make_song(rng, n_notes=30))
    body, ctype = multipart("file", "song.mid", data)
    status, _, out = wsgi_call(app, "POST", "/api/upload", body, ctype)
    assert status == "200 OK"
    name = json.loads(out)["file"]

    status, _, out = wsgi_call(app, "GET", f"/api/generate/pianobart/{name}")
    assert status == "200 OK"
    gen = json.loads(out)
    assert gen["file"].startswith("gen_")

    status, headers, blob = wsgi_call(app, "GET", f"/api/outputs/{gen['file']}")
    assert status == "200 OK"
    assert blob == data  # fake generator echoes input


def test_upload_without_file(app):
    body, ctype = multipart("other", "x.mid", b"123")
    status, _, out = wsgi_call(app, "POST", "/api/upload", body, ctype)
    assert status == "400 Bad Request"


def test_generate_missing_file(app):
    status, _, out = wsgi_call(app, "GET", "/api/generate/pianobart/nope.mid")
    assert status == "404 Not Found"


def test_unknown_routes(app):
    assert wsgi_call(app, "GET", "/api/secrets/passwd")[0] == "404 Not Found"
    assert wsgi_call(app, "GET", "/nope")[0] == "404 Not Found"
