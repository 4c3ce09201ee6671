"""Micro WSGI-kit unit tests (router, request parsing, error paths)."""

import io
import json

import pytest

from digipathai_tpu.server.wsgi_kit import App, HTTPError, Request, Response, abort


def call(app, path, method="GET", body=b"", ctype=""):
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(body)),
        "CONTENT_TYPE": ctype,
        "wsgi.input": io.BytesIO(body),
    }
    out = {}

    def start_response(status, headers):
        out["status"] = status
        out["headers"] = dict(headers)

    chunks = app(environ, start_response)
    out["body"] = b"".join(chunks)
    return out


@pytest.fixture()
def app():
    a = App()

    @a.route(r"/hello/(?P<name>\w+)")
    def hello(req, name):
        return Response(f"hi {name}")

    @a.route(r"/json", methods=("POST",))
    def echo(req):
        return Response.json(req.form)

    @a.route(r"/boom")
    def boom(req):
        raise RuntimeError("kapow")

    @a.route(r"/gone")
    def gone(req):
        abort(404, "not here")

    return a


class TestRouter:
    def test_named_groups(self, app):
        out = call(app, "/hello/world")
        assert out["status"].startswith("200")
        assert out["body"] == b"hi world"

    def test_404(self, app):
        assert call(app, "/nope")["status"].startswith("404")

    def test_405_wrong_method(self, app):
        assert call(app, "/json", method="GET")["status"].startswith("405")

    def test_urlencoded_form(self, app):
        out = call(app, "/json", method="POST", body=b"a=1&b=x+y",
                   ctype="application/x-www-form-urlencoded")
        assert json.loads(out["body"]) == {"a": "1", "b": "x y"}

    def test_json_body(self, app):
        out = call(app, "/json", method="POST", body=b'{"k": "v"}',
                   ctype="application/json")
        assert json.loads(out["body"]) == {"k": "v"}

    def test_malformed_json_body(self, app):
        out = call(app, "/json", method="POST", body=b"{nope",
                   ctype="application/json")
        assert json.loads(out["body"]) == {}

    def test_unhandled_exception_is_500(self, app):
        out = call(app, "/boom")
        assert out["status"].startswith("500")
        assert b"kapow" in out["body"]

    def test_abort(self, app):
        out = call(app, "/gone")
        assert out["status"].startswith("404")
        assert b"not here" in out["body"]

    def test_bad_content_length(self, app):
        environ = {
            "REQUEST_METHOD": "POST", "PATH_INFO": "/json",
            "QUERY_STRING": "", "CONTENT_LENGTH": "garbage",
            "CONTENT_TYPE": "application/x-www-form-urlencoded",
            "wsgi.input": io.BytesIO(b""),
        }
        req = Request(environ)
        assert req.form == {}
