"""Interactive demo (`app.py` Gradio HF-Spaces equivalent).

Serves a web UI: upload subject photos → model-style selector → prompt →
personalized generations. Uses Gradio when installed; otherwise falls back
to a dependency-free stdlib HTTP server with the same flow, so the demo
runs in minimal environments.

    python app.py [--port 7860] [--base_model ...] [--adaface_ckpt ...]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))

import numpy as np

MODEL_STYLES = {
    # the reference demo's model-style selector (photorealistic / realistic /
    # anime, `app.py:40-80`); here styles map to prompt prefixes until style
    # checkpoints are mounted
    "photorealistic": "photorealistic, sharp focus, ",
    "realistic": "realistic, natural skin texture, ",
    "anime": "anime illustration style, ",
}


class DemoBackend:
    def __init__(self, args):
        from _common import build_wrapper

        self.args = args
        self.wrapper = build_wrapper(args, "text2img")

    def generate(self, images: list[np.ndarray], prompt: str,
                 style: str = "photorealistic", num_images: int = 2,
                 guidance_scale: float = 5.0, seed: int | None = None):
        import jax

        ada = self.wrapper.prepare_adaface_embeddings(images=images)
        if ada is None:
            raise ValueError("no face detected in the uploaded images")
        seed = seed if seed is not None else int.from_bytes(os.urandom(2), "little")
        prefix = MODEL_STYLES.get(style, "")
        out = self.wrapper.forward(
            prefix + prompt, num_images=num_images,
            guidance_scale=guidance_scale,
            num_inference_steps=self.args.num_inference_steps,
            rng=jax.random.PRNGKey(seed))
        arr = (np.asarray(out) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
        return [a for a in arr], seed


def run_gradio(backend, port):
    import gradio as gr

    def fn(files, prompt, style, n, gs):
        from PIL import Image

        imgs = [np.asarray(Image.open(f).convert("RGB")) for f in files]
        outs, seed = backend.generate(imgs, prompt, style, int(n), gs)
        return outs

    demo = gr.Interface(
        fn=fn,
        inputs=[gr.File(file_count="multiple", label="Subject photos"),
                gr.Textbox(value="portrait at the beach", label="Prompt"),
                gr.Dropdown(list(MODEL_STYLES), value="photorealistic",
                            label="Style"),
                gr.Slider(1, 8, 2, step=1, label="Images"),
                gr.Slider(1.0, 12.0, 5.0, label="Guidance")],
        outputs=gr.Gallery(label="Generations"),
        title="AdaFace-TPU")
    demo.launch(server_port=port, server_name="0.0.0.0")


def run_stdlib(backend, port):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    PAGE = """<!doctype html><title>AdaFace-TPU</title>
<h2>AdaFace-TPU demo</h2>
<form method=post enctype=multipart/form-data action=/generate>
 Subject photos: <input type=file name=images multiple><br>
 Prompt: <input name=prompt size=60 value="portrait at the beach"><br>
 Style: <select name=style>%s</select>
 Count: <input name=n value=2 size=3>
 Guidance: <input name=gs value=5.0 size=4><br>
 <input type=submit value=Generate></form>""" % "".join(
        f"<option>{s}</option>" for s in MODEL_STYLES)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            import cgi  # noqa: F401 — python<3.13 path
            from email.parser import BytesParser
            from email.policy import default as default_policy

            from PIL import Image

            length = int(self.headers["Content-Length"])
            ctype = self.headers["Content-Type"]
            body = (b"Content-Type: " + ctype.encode() + b"\r\n\r\n"
                    + self.rfile.read(length))
            msg = BytesParser(policy=default_policy).parsebytes(body)
            imgs, fields = [], {}
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                payload = part.get_payload(decode=True)
                if part.get_filename():
                    if payload:
                        imgs.append(np.asarray(
                            Image.open(io.BytesIO(payload)).convert("RGB")))
                else:
                    fields[name] = payload.decode()
            try:
                outs, seed = backend.generate(
                    imgs, fields.get("prompt", ""),
                    fields.get("style", "photorealistic"),
                    int(fields.get("n", 2)), float(fields.get("gs", 5.0)))
                tags = []
                for a in outs:
                    buf = io.BytesIO()
                    Image.fromarray(a).save(buf, "PNG")
                    b64 = base64.b64encode(buf.getvalue()).decode()
                    tags.append(f'<img src="data:image/png;base64,{b64}">')
                html = f"<h3>seed {seed}</h3>" + "".join(tags) + \
                    '<p><a href="/">back</a></p>'
                self.send_response(200)
            except Exception as e:  # surfacing errors in the UI
                html = f"<pre>error: {e}</pre><a href='/'>back</a>"
                self.send_response(500)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(html.encode())

    print(f"AdaFace-TPU demo at http://0.0.0.0:{port} (stdlib server)")
    HTTPServer(("0.0.0.0", port), Handler).serve_forever()


def main():
    from _common import add_model_args

    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    args.num_inference_steps = min(args.num_inference_steps, 50)
    backend = DemoBackend(args)
    try:
        import gradio  # noqa: F401

        run_gradio(backend, args.port)
    except ImportError:
        run_stdlib(backend, args.port)


if __name__ == "__main__":
    main()
