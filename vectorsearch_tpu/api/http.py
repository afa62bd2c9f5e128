"""HTTP API (reference: main.go routes + server/*Http handlers).

Routes (main.go:168-178):
  POST|GET /api/search            -> {"documents": [...]}
  POST     /api/upload            -> {"document_ids": [...]}
  POST|GET /api/chat              -> chunked text/plain stream
  POST|GET /api/categories        -> {"category_names": [...]}
  POST|DELETE /api/delete/owner | /api/delete/category | /api/delete/document
  GET      /                      -> embedded UI, /api -> docs, openapi.yml

Middleware parity: WASM COOP/COEP headers on every route
(main.go:117-125), STREAMING zstd request decompression on every API
route (main.go:129-146 wraps r.Body in a zstd reader; here request chunks
feed an incremental decompressor, so the decompressed body is never
buffered twice), zstd response compression on upload/search AND the
static routes (main.go:168-178 — the reference compresses exactly those),
405 with Allow header, 400 on bad JSON, 499 when the client goes away
mid-request, 500 with {"error": ...} otherwise. Engine calls are
synchronous (device-bound), so they run in the default thread executor.
"""
from __future__ import annotations

import asyncio
import json
import os
import threading

from aiohttp import web

from .. import constants
from ..engine import Engine
from ..engine.engine import RequestCanceled
from ..logger import next_txid, sugar
from ..store.db import compress

STATIC_DIR = os.path.join(os.path.dirname(__file__), "static")

# zip-bomb guard on streamed request decompression (the reference streams
# straight into json.Decode with no cap; we bound the expansion)
MAX_DECOMPRESSED = 1 << 30


def _json_error(status: int, message: str, **headers) -> web.Response:
    return web.Response(
        status=status,
        text=json.dumps({"error": message}),
        content_type="application/json",
        headers=headers,
    )


async def _read_json(request: web.Request):
    if request.headers.get("Content-Encoding", "").strip().lower() == "zstd":
        # streaming decompression: raw chunks feed an incremental
        # decompressor (reference: zstdRequestReader, main.go:129-146)
        try:
            import zstandard

            dctx = zstandard.ZstdDecompressor().decompressobj()
            parts = []
            total = 0
            async for chunk in request.content.iter_chunked(1 << 16):
                # feed the decompressor in small slices: one RLE block
                # expands ~4 B -> 128 KB, so a single 64 KB input chunk
                # could balloon to ~2 GB in one decompress() call before
                # the cap is ever checked; 1 KB slices bound the
                # per-call transient to ~32 MB
                view = memoryview(chunk)
                for off in range(0, len(view), 1024):
                    part = dctx.decompress(view[off : off + 1024])
                    total += len(part)
                    if total > MAX_DECOMPRESSED:
                        raise ValueError("decompressed body too large")
                    if part:
                        parts.append(part)
            body = b"".join(parts)
        except ImportError:  # pragma: no cover - zstd present in image
            from ..store.db import decompress

            body = decompress(await request.read())
    else:
        body = await request.read()
    if not body:
        return {}
    req = json.loads(body)
    if not isinstance(req, dict):
        # every API body is a JSON object; a bare string/array would hit
        # req.get(...) in handlers and 500 instead of 400
        raise ValueError("request body must be a JSON object")
    return req


def _maybe_compress(request: web.Request, payload: bytes) -> tuple[bytes, dict]:
    accepts = request.headers.get("Accept-Encoding", "")
    if "zstd" in accepts.lower() and len(payload) > 64:
        return compress(payload), {"Content-Encoding": "zstd"}
    return payload, {}


def _json_response(request: web.Request, obj, compressible: bool = False):
    raw = json.dumps(obj).encode("utf-8")
    headers = {}
    if compressible:
        raw, headers = _maybe_compress(request, raw)
    return web.Response(
        body=raw, content_type="application/json", headers=headers
    )


@web.middleware
async def _wasm_headers(request: web.Request, handler):
    """COOP/COEP on every response (reference main.go:117-125): what lets
    pdfjs/WASM run in the browser UI (SharedArrayBuffer isolation)."""
    resp = await handler(request)
    resp.headers["Cross-Origin-Opener-Policy"] = "same-origin"
    resp.headers["Cross-Origin-Embedder-Policy"] = "require-corp"
    return resp


def build_app(engine: Engine) -> web.Application:
    app = web.Application(
        client_max_size=256 * 1024 * 1024, middlewares=[_wasm_headers]
    )

    def handler(methods, fn, compressible=False):
        async def wrapped(request: web.Request):
            txid = next_txid()
            if request.method not in methods:
                # RFC 9110 §15.5.6: Allow lists every supported method
                return _json_error(
                    405, "Invalid request method", Allow=", ".join(methods)
                )
            try:
                req = await _read_json(request)
            except Exception:
                return _json_error(400, "Invalid request")
            # client-cancel propagation (reference: ctx.Err() checks at
            # every stage, server/search.go:86-91): a disconnect cancels
            # this coroutine; the engine call keeps running on its executor
            # thread, so the cancel event tells it to abort between stages
            # instead of holding the device semaphore for a dead client
            cancel = threading.Event()
            fut = asyncio.get_running_loop().run_in_executor(
                None, fn, req, cancel
            )
            try:
                result = await fut
            except asyncio.CancelledError:
                cancel.set()
                # the abandoned future would warn "exception never
                # retrieved" when the engine raises RequestCanceled (the
                # await's cancellation usually cancels the asyncio wrapper
                # itself, in which case there is nothing to consume)
                fut.add_done_callback(
                    lambda f: None if f.cancelled() else f.exception()
                )
                sugar().warning("%d request canceled (499)", txid)
                raise
            except RequestCanceled:
                sugar().warning("%d request canceled by engine (499)", txid)
                return _json_error(499, "Client closed request")
            except (ValueError, KeyError, TypeError) as e:
                sugar().warning("%d bad request: %s", txid, e)
                return _json_error(400, "Invalid request")
            except Exception as e:
                sugar().error("%d request failed: %s", txid, e)
                return _json_error(500, "Request failed")
            return _json_response(request, result, compressible=compressible)

        return wrapped

    # ---- search (server/search.go:45-112) ----
    def _hit_dict(h):
        return {
            "name": h.name,
            "external_id": h.external_id,
            "document": h.document,
            "document_id": h.document_id,
            "document_similarity": h.similarity,
        }

    def do_search(req, cancel):
        texts = req.get("texts")
        if texts is not None:
            # batched extension: N queries in one request -> one device
            # dispatch per batch class (engine.search_many docstring).
            # Must be a JSON array: a bare string would iterate per
            # CHARACTER; bound the size like count is bounded (1..20)
            if not isinstance(texts, list) or not all(
                isinstance(t, str) for t in texts
            ):
                raise ValueError("texts must be an array of strings")
            if len(texts) > constants.MAX_QUERY_BATCH:
                raise ValueError(
                    f"texts exceeds {constants.MAX_QUERY_BATCH} queries"
                )
            pages = engine.search_many(
                req.get("owner", ""),
                req.get("category", ""),
                texts,
                count=int(req.get("count", 0) or 0) or 1,
                offset=int(req.get("offset", 0) or 0),
                centroids=int(req.get("centroids", 0) or 0),
                include_documents=bool(req.get("include_documents", True)),
                cancel=cancel,
            )
            return {
                "results": [
                    {"documents": [_hit_dict(h) for h in page]}
                    for page in pages
                ]
            }
        hits = engine.search(
            req.get("owner", ""),
            req.get("category", ""),
            req.get("text", ""),
            count=int(req.get("count", 0) or 0) or 1,
            offset=int(req.get("offset", 0) or 0),
            centroids=int(req.get("centroids", 0) or 0),
            cancel=cancel,
        )
        return {"documents": [_hit_dict(h) for h in hits]}

    # ---- upload (server/upload.go:40-108) ----
    def do_upload(req, cancel):
        docs = req.get("documents") or []
        if not isinstance(docs, list) or not all(
            isinstance(d, dict) for d in docs
        ):
            # a string entry would hit doc.get(...) in the engine and 500
            raise ValueError("documents must be an array of objects")
        ids = engine.upload(
            req.get("owner", ""), req.get("category", ""), docs, cancel=cancel
        )
        return {"document_ids": ids}

    # ---- categories (server/fetch.go:27-97) ----
    def do_categories(req, cancel):
        return {"category_names": engine.fetch_category_names(req.get("owner", ""))}

    # ---- deletes (server/delete.go) ----
    def do_delete_owner(req, cancel):
        engine.delete_owner(req.get("owner", ""))
        return {}

    def do_delete_category(req, cancel):
        engine.delete_category(req.get("owner", ""), req.get("category", ""))
        return {}

    def do_delete_document(req, cancel):
        engine.delete_document(
            req.get("owner", ""),
            req.get("category", ""),
            int(req.get("document_id", 0)),
        )
        return {}

    # ---- chat: chunked text stream (server/chat.go:31-106) ----
    async def chat_handler(request: web.Request):
        txid = next_txid()
        if request.method not in ("POST", "GET"):
            return _json_error(405, "Invalid request method", Allow="POST, GET")
        try:
            req = await _read_json(request)
        except Exception:
            return web.Response(status=400, text="Invalid request")
        resp = web.StreamResponse()
        resp.content_type = "text/plain"
        resp.enable_chunked_encoding()
        await resp.prepare(request)
        loop = asyncio.get_running_loop()
        try:
            stream = await loop.run_in_executor(
                None,
                lambda: engine.chat(
                    req.get("text", ""),
                    prefix=req.get("prefix", ""),
                    history=req.get("history") or [],
                    document_ids=req.get("document_ids") or [],
                    documents=req.get("documents") or [],
                ),
            )
            it = iter(stream)
            while True:
                delta = await loop.run_in_executor(None, next, it, None)
                if delta is None:
                    break
                await resp.write(delta.encode("utf-8"))
        except asyncio.CancelledError:
            sugar().warning("%d chat canceled", txid)
            raise
        except Exception as e:
            sugar().error("%d chat failed: %s", txid, e)
        await resp.write_eof()
        return resp

    app.router.add_route(
        "*", "/api/search", handler(("POST", "GET"), do_search, compressible=True)
    )
    app.router.add_route(
        "*", "/api/upload", handler(("POST",), do_upload, compressible=True)
    )
    app.router.add_route("*", "/api/chat", chat_handler)
    app.router.add_route(
        "*", "/api/categories", handler(("POST", "GET"), do_categories)
    )
    app.router.add_route(
        "*", "/api/delete/owner", handler(("POST", "DELETE"), do_delete_owner)
    )
    app.router.add_route(
        "*",
        "/api/delete/category",
        handler(("POST", "DELETE"), do_delete_category),
    )
    app.router.add_route(
        "*",
        "/api/delete/document",
        handler(("POST", "DELETE"), do_delete_document),
    )

    # ---- static UI + API docs (reference: static/static.go, ui/) ----
    # compressed like the reference's "/" FileServer route (main.go:178);
    # assets are immutable per process, so raw + compressed bytes are
    # computed once, not per request
    def static_handler(name: str, ctype: str):
        path = os.path.join(STATIC_DIR, name)
        with open(path, "rb") as f:
            raw = f.read()
        zbody = compress(raw) if len(raw) > 64 else raw
        zheaders = {"Content-Encoding": "zstd"} if len(raw) > 64 else {}

        async def serve(request):
            accepts = request.headers.get("Accept-Encoding", "")
            if "zstd" in accepts.lower() and zheaders:
                return web.Response(
                    body=zbody, content_type=ctype, headers=zheaders
                )
            return web.Response(body=raw, content_type=ctype)

        return serve

    index = static_handler("index.html", "text/html")
    api_docs = static_handler("api.html", "text/html")
    openapi = static_handler("openapi.yml", "text/yaml")
    doctools = static_handler("doctools.js", "application/javascript")

    async def stats(request):
        loop = asyncio.get_running_loop()
        data = await loop.run_in_executor(None, engine.stats)
        try:
            from ..utils import device_memory_stats

            data["devices"] = device_memory_stats()
        except Exception:
            pass
        return web.json_response(data)

    app.router.add_get("/", index)
    app.router.add_get("/doctools.js", doctools)
    app.router.add_get("/api", api_docs)
    app.router.add_get("/api/openapi.yml", openapi)
    app.router.add_get("/api/stats", stats)
    return app
