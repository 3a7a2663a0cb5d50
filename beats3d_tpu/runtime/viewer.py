"""Thin live viewer + tunables server — the headless build's stand-in for the
reference's imgui surface (3d_bz.py:290-384: per-finger height graphs with
threshold bands, ms/frame plot, live sliders, recalibrate/reset buttons).

A stdlib-only HTTP server runs in a daemon thread next to BeatsApp:

  GET  /            self-contained HTML/JS page (no external assets)
  GET  /state.json  latest heights/valid/thresholds/notes/frame-times + the
                    label render as a base64 PNG
  POST /tunables    {"field": value} -> mutates AppConfig live (the sliders)
  POST /action      {"action": "recalibrate_plane" | "reset_fingers"}

The app pushes state with ViewerState.push(...) each frame; encoding the
label PNG happens at most every ``render_every`` frames to keep the loop hot.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

TUNABLE_FIELDS = (
    # name, min, max, step  (3d_bz.py:323-356 slider ranges)
    ("z_thresh_offset", 0.0, 100.0, 1.0),
    ("min_velocity", 0.0, 50.0, 0.5),
    ("max_velocity", 10.0, 300.0, 1.0),
    ("group_min_size", 0.0, 0.2, 0.005),
)

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>3d-beats</title>
<style>
 body{background:#111;color:#ddd;font:13px monospace;margin:14px}
 canvas{background:#1a1a1a;display:block;margin:4px 0;border:1px solid #333}
 .row{display:flex;gap:18px;flex-wrap:wrap}
 label{display:block;margin:6px 0 2px}
 input[type=range]{width:240px;vertical-align:middle}
 button{background:#333;color:#ddd;border:1px solid #555;margin:4px 6px 0 0;
        padding:4px 10px;cursor:pointer}
 .on{color:#7f7}
</style></head><body>
<h3>3d-beats — live</h3>
<div class="row">
 <div>
  <img id="labels" width="424" height="240" style="border:1px solid #333">
  <canvas id="ms" width="424" height="90"></canvas>
  <div id="stats"></div>
 </div>
 <div>
  <div id="hands"></div>
 </div>
 <div id="controls">
  <div id="sliders"></div>
  <button onclick="act('recalibrate_plane')">recalibrate plane</button>
  <button onclick="act('reset_fingers')">reset fingers</button>
  <label>midi port: <select id="midiport"
    onchange="fetch('/action',{method:'POST',body:JSON.stringify(
      {action:'set_midi_port',port:+this.value})})"></select></label>
 </div>
</div>
<script>
const F=%FIELDS%;
const hist={}; const msHist=[];
function slider(f){
 const d=document.createElement('div');
 d.innerHTML=`<label>${f[0]}: <span id="v_${f[0]}"></span></label>
  <input type="range" min="${f[1]}" max="${f[2]}" step="${f[3]}" id="s_${f[0]}"
   oninput="setv('${f[0]}',this.value)">`;
 document.getElementById('sliders').appendChild(d);
}
F.forEach(slider);
function setv(name,v){
 document.getElementById('v_'+name).textContent=v;
 fetch('/tunables',{method:'POST',body:JSON.stringify({[name]:+v})});
}
function act(a){fetch('/action',{method:'POST',body:JSON.stringify({action:a})})}
function handCanvas(h,f){
 const id=`hc_${h}_${f}`;
 let c=document.getElementById(id);
 if(!c){c=document.createElement('canvas');c.id=id;c.width=200;c.height=56;
  document.getElementById('hands').appendChild(c);}
 return c;
}
let midiInit=false;
async function tick(){
 try{
  const s=await (await fetch('/state.json')).json();
  if(!midiInit&&s.midi_ports){
   const sel=document.getElementById('midiport');
   s.midi_ports.forEach((p,i)=>{const o=document.createElement('option');
    o.value=i;o.textContent=p;sel.appendChild(o)});
   sel.value=s.midi_port; midiInit=true;
  }
  if(s.labels_png) document.getElementById('labels').src=
    'data:image/png;base64,'+s.labels_png;
  document.getElementById('stats').textContent=
    `frame ${s.frame} | ${s.ms_per_frame.toFixed(1)} ms/frame | `+
    `${s.fps.toFixed(1)} fps`;
  msHist.push(s.ms_per_frame); if(msHist.length>100) msHist.shift();
  const mc=document.getElementById('ms').getContext('2d');
  mc.clearRect(0,0,424,90);
  mc.strokeStyle='#6af'; mc.beginPath();
  msHist.forEach((v,i)=>{const y=90-Math.min(v,100)*0.9;
    i?mc.lineTo(i*4.24,y):mc.moveTo(0,y)}); mc.stroke();
  mc.fillStyle='#888'; mc.fillText('ms/frame (0-100)',6,12);
  for(let h=0;h<2;h++) for(let f=0;f<5;f++){
   const k=`${h}_${f}`;
   if(!hist[k]) hist[k]=[];
   hist[k].push(s.heights[h][f]); if(hist[k].length>100) hist[k].shift();
   const c=handCanvas(h,f), g=c.getContext('2d');
   g.clearRect(0,0,200,56);
   const th=s.thresholds[h][f], on=s.note_on[h][f];
   const sy=v=>56-Math.max(0,Math.min(v,400))*0.14;
   g.strokeStyle='#555'; g.beginPath();
   g.moveTo(0,sy(th)); g.lineTo(200,sy(th)); g.stroke();
   g.strokeStyle=on?'#7f7':'#fa5'; g.beginPath();
   hist[k].forEach((v,i)=>{i?g.lineTo(i*2,sy(v)):g.moveTo(0,sy(v))});
   g.stroke();
   g.fillStyle=on?'#7f7':'#888';
   g.fillText(`hand ${h} finger ${f}${on?' ON':''}`,6,10);
  }
 }catch(e){}
 setTimeout(tick,100);
}
tick();
</script></body></html>"""


class ViewerState:
    """Thread-safe latest-state holder the app pushes into."""

    def __init__(self, render_every: int = 6):
        self.lock = threading.Lock()
        self.render_every = render_every
        self.frame = 0
        self._state = {
            "frame": 0, "ms_per_frame": 0.0, "fps": 0.0,
            "heights": [[0.0] * 5, [0.0] * 5],
            "thresholds": [[0.0] * 5, [0.0] * 5],
            "note_on": [[False] * 5, [False] * 5],
            "guard_muted": [False, False],
            "labels_png": None,
            "midi_ports": [], "midi_port": -1,
        }
        self._ms = deque(maxlen=100)

    def push(self, app, out: Optional[dict]):
        """Collect from a BeatsApp after tick(); cheap unless it's a render
        frame."""
        import time as _t

        self.frame += 1
        now = _t.perf_counter()
        if hasattr(self, "_last"):
            self._ms.append((now - self._last) * 1e3)
        self._last = now

        heights = [[0.0] * 5, [0.0] * 5]
        muted = [False, False]
        if out is not None:
            hv = np.asarray(out["heights"])
            for h in range(2):
                heights[h] = [float(v) for v in hv[h]]
            if "guard_muted" in out:
                # incoherence-guard verdicts: lets the dashboard show "hand
                # muted by guard" instead of "no hand" (pipeline.frame_step)
                gm = np.asarray(out["guard_muted"]).reshape(-1)[:2]
                muted = [bool(v) for v in gm]
        thresholds = [
            [float(f.z_thresh) for f in hs.fingertips]
            for hs in app.hand_states
        ]
        note_on = [
            [bool(f.note_on) for f in hs.fingertips]
            for hs in app.hand_states
        ]
        png = None
        if self.frame % self.render_every == 0:
            rgba = app.labels_rgba()
            if rgba is not None:
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(rgba).save(buf, format="PNG")
                png = base64.b64encode(buf.getvalue()).decode()

        ms = float(np.mean(self._ms)) if self._ms else 0.0
        with self.lock:
            st = self._state
            st["frame"] = self.frame
            st["ms_per_frame"] = ms
            st["fps"] = 1e3 / ms if ms > 0 else 0.0
            st["heights"] = heights
            st["thresholds"] = thresholds
            st["note_on"] = note_on
            st["guard_muted"] = muted
            # rtmidi port list for the selector (3d_bz.py:311-317); the sink
            # fallback shows an empty list.
            st["midi_ports"] = list(getattr(app.midi, "port_names", []))
            st["midi_port"] = int(getattr(app.midi, "port", -1))
            if png is not None:
                st["labels_png"] = png

    def snapshot(self) -> dict:
        with self.lock:
            return dict(self._state)


class ViewerServer:
    """Serve the dashboard + accept tunable mutations for a BeatsApp."""

    def __init__(self, app, host: str = "127.0.0.1", port: int = 8799,
                 render_every: int = 6):
        self.app = app
        self.state = ViewerState(render_every)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.end_headers()
                self.wfile.write(body.encode() if isinstance(body, str)
                                 else body)

            def do_GET(self):
                if self.path.startswith("/state.json"):
                    self._send(200, json.dumps(outer.state.snapshot()))
                else:
                    page = _PAGE.replace(
                        "%FIELDS%", json.dumps([list(f) for f in
                                                TUNABLE_FIELDS])
                    )
                    self._send(200, page, "text/html")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._send(400, '{"err": "bad json"}')
                if self.path.startswith("/tunables"):
                    allowed = {f[0] for f in TUNABLE_FIELDS}
                    for k, v in body.items():
                        if k in allowed:
                            setattr(outer.app.cfg, k, float(v))
                    return self._send(200, "{}")
                if self.path.startswith("/action"):
                    act = body.get("action")
                    if act == "recalibrate_plane":
                        outer.app.recalibrate_plane()
                    elif act == "reset_fingers":
                        outer.app.reset_fingers()
                    elif act == "set_midi_port":
                        outer.app.midi.set_port(int(body.get("port", 0)))
                    return self._send(200, "{}")
                self._send(404, "{}")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def start(self):
        self.thread.start()
        return self

    def push(self, out):
        self.state.push(self.app, out)

    def stop(self):
        self.httpd.shutdown()
