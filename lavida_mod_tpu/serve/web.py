"""Browser chat UI — the gradio_web_server analogue (reference
llava/serve/gradio_web_server.py) without the gradio dependency: the model
worker serves a single-page app (image upload + prompt + sampler knobs)
that posts to its own /worker_generate endpoint."""

from __future__ import annotations

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>LaViDa TPU</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:760px;margin:2rem auto;padding:0 1rem}
 textarea,input,select,button{font:inherit;padding:.4rem}
 textarea{width:100%%}
 #out{white-space:pre-wrap;background:#f6f6f6;border-radius:8px;padding:1rem;min-height:3rem}
 .row{display:flex;gap:.75rem;align-items:center;margin:.5rem 0;flex-wrap:wrap}
 img#preview{max-height:200px;border-radius:8px}
</style></head><body>
<h2>LaViDa — masked-diffusion VLM (TPU)</h2>
<div class="row"><input type="file" id="img" accept="image/*"></div>
<img id="preview" hidden>
<textarea id="prompt" rows="3">Describe the image in detail.</textarea>
<div class="row">
 <label>max new tokens <input id="mnt" type="number" value="32" style="width:5rem"></label>
 <label>steps <input id="steps" type="number" value="16" style="width:4rem"></label>
 <label>schedule <select id="sched"><option value="">none</option>
   <option>shift</option><option>cosine</option><option>linear</option></select></label>
 <label><input id="cache" type="checkbox" checked> prefix cache</label>
 <button id="go">Generate</button>
</div>
<div id="out">—</div><div id="lat"></div>
<script>
const b64 = f => new Promise(r => {const fr = new FileReader();
  fr.onload = () => r(fr.result.split(',')[1]); fr.readAsDataURL(f);});
img.onchange = () => {preview.src = URL.createObjectURL(img.files[0]); preview.hidden = false;};
go.onclick = async () => {
  out.textContent = '…';
  const images = img.files.length ? [await b64(img.files[0])] : [];
  const gen_kwargs = {max_new_tokens: +mnt.value, step_per_block: +steps.value,
    prefix_lm: cache.checked};
  if (sched.value) {gen_kwargs.schedule = sched.value; gen_kwargs.schedule__shift = 0.33;}
  const r = await fetch('/worker_generate', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({prompt: prompt.value, images, gen_kwargs})});
  const j = await r.json();
  out.textContent = j.error_code ? ('error: ' + j.error) : j.text;
  lat.textContent = j.latency_s ? j.latency_s.toFixed(2) + ' s' : '';
};
</script></body></html>"""


def install_web_ui(worker_cls):
    """Extend ModelWorker.serve's handler with GET / -> the page.  Called
    from serve/__main__ style launchers; kept separate so the worker stays
    dependency-free."""
    return PAGE
