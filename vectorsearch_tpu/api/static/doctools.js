/* Client-side document text extraction (reference: ui/src/tools/pdf.ts,
 * ui/src/tools/doc.ts — which use pdfjs/WASM; this image cannot vendor
 * pdfjs offline, so both formats are parsed directly with the browser's
 * native DecompressionStream).
 *
 * extractDocx: OOXML .docx is a zip; walk the central directory, inflate
 *   word/document.xml (deflate-raw), pull the <w:t> runs per paragraph.
 * extractPdf: inflate /FlateDecode content streams (zlib deflate), then
 *   collect the text-showing operators Tj / TJ / ' / ". Standard-encoded
 *   fonts only — CID/Type0-subset PDFs need a full font machinery
 *   (pdfjs) and fall back to a warning.
 */
"use strict";

async function _inflate(bytes, format) {
  const ds = new DecompressionStream(format);
  const stream = new Blob([bytes]).stream().pipeThrough(ds);
  const buf = await new Response(stream).arrayBuffer();
  return new Uint8Array(buf);
}

/* ---------------- DOCX ---------------- */

function _zipEntries(view) {
  // find End Of Central Directory (scan backwards for PK\x05\x06)
  const u8 = new Uint8Array(view.buffer);
  let eocd = -1;
  for (let i = u8.length - 22; i >= 0; i--) {
    if (view.getUint32(i, true) === 0x06054b50) { eocd = i; break; }
  }
  if (eocd < 0) throw new Error("not a zip (no EOCD)");
  const count = view.getUint16(eocd + 10, true);
  let off = view.getUint32(eocd + 16, true);
  const entries = [];
  const dec = new TextDecoder();
  for (let n = 0; n < count; n++) {
    if (view.getUint32(off, true) !== 0x02014b50) break;
    const method = view.getUint16(off + 10, true);
    const csize = view.getUint32(off + 20, true);
    const nameLen = view.getUint16(off + 28, true);
    const extraLen = view.getUint16(off + 30, true);
    const commentLen = view.getUint16(off + 32, true);
    const localOff = view.getUint32(off + 42, true);
    const name = dec.decode(u8.subarray(off + 46, off + 46 + nameLen));
    entries.push({ name, method, csize, localOff });
    off += 46 + nameLen + extraLen + commentLen;
  }
  return entries;
}

async function _zipRead(view, entry) {
  const u8 = new Uint8Array(view.buffer);
  const lo = entry.localOff;
  if (view.getUint32(lo, true) !== 0x04034b50) throw new Error("bad local header");
  const nameLen = view.getUint16(lo + 26, true);
  const extraLen = view.getUint16(lo + 28, true);
  const start = lo + 30 + nameLen + extraLen;
  const raw = u8.subarray(start, start + entry.csize);
  if (entry.method === 0) return raw;
  if (entry.method === 8) return _inflate(raw, "deflate-raw");
  throw new Error("unsupported zip method " + entry.method);
}

function _xmlEntities(s) {
  return s
    .replace(/&lt;/g, "<").replace(/&gt;/g, ">").replace(/&quot;/g, '"')
    .replace(/&apos;/g, "'")
    .replace(/&#x([0-9a-fA-F]+);/g, (_, h) => String.fromCodePoint(parseInt(h, 16)))
    .replace(/&#(\d+);/g, (_, d) => String.fromCodePoint(+d))
    .replace(/&amp;/g, "&");
}

async function extractDocx(arrayBuffer) {
  const view = new DataView(arrayBuffer);
  const entry = _zipEntries(view).find(e => e.name === "word/document.xml");
  if (!entry) throw new Error("no word/document.xml (not a .docx?)");
  const xml = new TextDecoder().decode(await _zipRead(view, entry));
  const paras = [];
  for (const p of xml.split("</w:p>")) {
    const runs = [];
    // <w:t> runs carry the text; <w:tab/> and <w:br/> are whitespace
    const withBreaks = p.replace(/<w:tab\/>/g, "\t").replace(/<w:br\/>/g, "\n");
    const re = /<w:t(?:\s[^>]*)?>([\s\S]*?)<\/w:t>/g;
    let m;
    while ((m = re.exec(withBreaks)) !== null) runs.push(_xmlEntities(m[1]));
    if (runs.length) paras.push(runs.join(""));
  }
  return paras.join("\n");
}

/* ---------------- PDF ---------------- */

function _latin1(bytes) {
  let s = "";
  const CHUNK = 0x8000;
  for (let i = 0; i < bytes.length; i += CHUNK) {
    s += String.fromCharCode.apply(null, bytes.subarray(i, i + CHUNK));
  }
  return s;
}

function _pdfString(body) {
  // decode a PDF literal string body: escapes \n \r \t \b \f \( \) \\ \ddd
  let out = "", i = 0;
  while (i < body.length) {
    const c = body[i];
    if (c !== "\\") { out += c; i++; continue; }
    const n = body[i + 1];
    if (n === "n") out += "\n";
    else if (n === "r") out += "\r";
    else if (n === "t") out += "\t";
    else if (n === "b" || n === "f") out += "";
    else if (n >= "0" && n <= "7") {
      let oct = "", j = i + 1;
      while (j < body.length && oct.length < 3 && body[j] >= "0" && body[j] <= "7") oct += body[j++];
      out += String.fromCharCode(parseInt(oct, 8));
      i = j;
      continue;
    } else out += n || "";
    i += 2;
  }
  return out;
}

function _pdfTextOps(content) {
  // collect arguments of Tj / ' / " and TJ arrays, in stream order
  const parts = [];
  // literal strings, balanced enough for text content: scan manually
  let i = 0;
  while (i < content.length) {
    const c = content[i];
    if (c === "(") {
      let depth = 1, j = i + 1, body = "";
      while (j < content.length && depth > 0) {
        const d = content[j];
        if (d === "\\") { body += d + (content[j + 1] || ""); j += 2; continue; }
        if (d === "(") depth++;
        else if (d === ")") { depth--; if (!depth) break; }
        if (depth > 0) body += d;
        j++;
      }
      // operator that follows decides whether it's shown text
      const after = content.slice(j + 1, j + 8);
      if (/^\s*(Tj|'|")/.test(after) || _inTJ) parts.push(_pdfString(body));
      i = j + 1;
      continue;
    }
    if (c === "[") { _inTJ = _looksLikeTJ(content, i); }
    if (c === "]") { _inTJ = false; }
    if (c === "T" && (content[i + 1] === "d" || content[i + 1] === "D" || content[i + 1] === "*")) {
      parts.push("\n");
    }
    i++;
  }
  return parts.join("").replace(/\n{2,}/g, "\n");
}

let _inTJ = false;
function _looksLikeTJ(content, i) {
  // a [ ... ] TJ array: peek for the closing ] followed by TJ
  const close = content.indexOf("]", i);
  if (close < 0 || close - i > 4096) return false;
  return /^\s*TJ/.test(content.slice(close + 1, close + 6));
}

async function extractPdf(arrayBuffer) {
  const u8 = new Uint8Array(arrayBuffer);
  const s = _latin1(u8);
  if (!s.startsWith("%PDF")) throw new Error("not a PDF");
  const texts = [];
  const streamRe = /stream\r?\n/g;
  let m;
  while ((m = streamRe.exec(s)) !== null) {
    const start = m.index + m[0].length;
    const end = s.indexOf("endstream", start);
    if (end < 0) break;
    // the object dict sits just before "stream"
    const dictStart = s.lastIndexOf("<<", m.index);
    const dict = dictStart >= 0 ? s.slice(dictStart, m.index) : "";
    let data = u8.subarray(start, end);
    if (/\/FlateDecode/.test(dict)) {
      try { data = await _inflate(data, "deflate"); } catch { continue; }
    }
    if (/\/Subtype\s*\/Image/.test(dict) || /\/FontFile/.test(dict)) continue;
    const content = _latin1(data);
    if (/\b(Tj|TJ|BT)\b/.test(content)) {
      _inTJ = false;
      texts.push(_pdfTextOps(content));
    }
  }
  const text = texts.join("\n").replace(/[ \t]+/g, " ").trim();
  if (!text) throw new Error("no extractable text (scanned or CID-encoded PDF?)");
  let junk = 0;
  for (const ch of text) {
    const code = ch.codePointAt(0);
    if (code < 0x20 && ch !== "\n" && ch !== "\r" && ch !== "\t") junk++;
  }
  if (junk / text.length > 0.3) {
    throw new Error("text appears CID/Type0-encoded; this lightweight parser cannot map it");
  }
  return text;
}

window.extractDocx = extractDocx;
window.extractPdf = extractPdf;
