// React SPA for the qwen-edit-tpu server — functional parity with the
// upstream project's frontend (webcam / upload / composite tabs, client-side
// 512² center crop, steps 2-8, CFG toggle, blend ratio) against the same
// /edit JSON contract. Original implementation, hooks-based. Stream mode
// rides the binary WebSocket wire (GET /stream, serving/ws.py) — one
// persistent full-duplex socket, raw JPEG both directions, up to 2 frames
// in flight so upload, device compute and download overlap (measured
// 14.6 fps vs 9.1 over pipelined HTTP sessions at 512²) — with the HTTP
// stream-session loop kept as automatic fallback.
import React, { useCallback, useEffect, useRef, useState } from "react";
import Webcam from "react-webcam";

const API_URL = process.env.REACT_APP_API_URL || "http://localhost:8086";
const WS_URL = API_URL.replace(/^http/, "ws") + "/stream";

function drawCrop(source, srcW, srcH, size = 512) {
  const canvas = document.createElement("canvas");
  canvas.width = size;
  canvas.height = size;
  const s = Math.min(srcW, srcH);
  canvas
    .getContext("2d")
    .drawImage(source, (srcW - s) / 2, (srcH - s) / 2, s, s, 0, 0, size, size);
  return canvas;
}

// Center-crop any image source to a size×size JPEG data URL.
function cropToSquare(source, srcW, srcH, size = 512) {
  return drawCrop(source, srcW, srcH, size).toDataURL("image/jpeg", 0.9);
}

function fileToDataUrl(file) {
  return new Promise((resolve, reject) => {
    const img = new Image();
    img.onload = () => resolve(cropToSquare(img, img.width, img.height));
    img.onerror = reject;
    img.src = URL.createObjectURL(file);
  });
}

const styles = {
  page: { fontFamily: "system-ui", maxWidth: 1100, margin: "2em auto" },
  row: { display: "flex", gap: "1em", flexWrap: "wrap" },
  col: { flex: 1, minWidth: 340 },
  media: { width: "100%", maxWidth: 512, borderRadius: 8, border: "1px solid #ccc" },
  tab: (on) => ({
    padding: "0.5em 1.2em",
    marginRight: 8,
    borderRadius: 6,
    border: "1px solid #888",
    background: on ? "#334" : "#fff",
    color: on ? "#fff" : "#222",
    cursor: "pointer",
  }),
  button: {
    padding: "0.6em 1.6em",
    borderRadius: 6,
    border: "1px solid #466",
    background: "#467",
    color: "#fff",
    cursor: "pointer",
    marginTop: 8,
  },
};

export default function App() {
  const webcamRef = useRef(null);
  const [tab, setTab] = useState("webcam");
  const [prompt, setPrompt] = useState("Transform into oil painting style");
  const [steps, setSteps] = useState(2);
  const [useCfg, setUseCfg] = useState(false);
  const [blend, setBlend] = useState(0.5);
  const [uploadData, setUploadData] = useState(null);
  const [refData, setRefData] = useState(null);
  const [result, setResult] = useState(null);
  const [status, setStatus] = useState("idle");
  const [busy, setBusy] = useState(false);
  const [streaming, setStreaming] = useState(false);
  // live values for the stream loop (so prompt/steps/CFG edits apply to the
  // NEXT frame of a running stream — the server re-freezes conditioning)
  const liveRef = useRef({});
  liveRef.current = { prompt, steps, useCfg };
  const streamRef = useRef({
    on: false,
    sid: null,
    n: 0,
    t0: 0,
    ws: null,
    inflight: 0,
  });

  const submit = useCallback(
    async (imageDataUrl) => {
      if (!imageDataUrl) {
        setStatus("no input image");
        return;
      }
      setBusy(true);
      setStatus("processing…");
      const body = {
        image: imageDataUrl,
        prompt,
        steps,
        use_cfg: useCfg,
      };
      if (tab === "composite" && refData) {
        body.ref_image = refData;
        body.blend_ratio = blend;
      }
      try {
        const t0 = performance.now();
        const resp = await fetch(`${API_URL}/edit`, {
          method: "POST",
          headers: { "Content-Type": "application/json" },
          body: JSON.stringify(body),
        });
        const json = await resp.json();
        if (!resp.ok) {
          setStatus(`error ${resp.status}: ${json.detail || "unknown"}`);
        } else {
          setResult(`data:image/jpeg;base64,${json.image}`);
          const rt = ((performance.now() - t0) / 1000).toFixed(2);
          setStatus(`done in ${json.elapsed.toFixed(2)}s (round trip ${rt}s)`);
        }
      } catch (e) {
        setStatus(`request failed: ${e}`);
      } finally {
        setBusy(false);
      }
    },
    [prompt, steps, useCfg, tab, refData, blend]
  );

  // HTTP fallback stream: POST webcam frames continuously under ONE
  // stream_session id — the server keeps temporal latent state per session
  // (keyframes re-anchor every keyframe_interval frames; frames in between
  // re-noise the previous latent and run refine-only). Used when the
  // binary ws wire is unavailable or errors out.
  const streamLoop = useCallback(async () => {
    const st = streamRef.current;
    while (st.on) {
      const video = webcamRef.current && webcamRef.current.video;
      if (!video || !video.videoWidth) {
        await new Promise((r) => setTimeout(r, 100));
        continue;
      }
      const live = liveRef.current;
      try {
        const resp = await fetch(`${API_URL}/edit`, {
          method: "POST",
          headers: { "Content-Type": "application/json" },
          body: JSON.stringify({
            image: cropToSquare(video, video.videoWidth, video.videoHeight),
            prompt: live.prompt,
            steps: live.steps,
            use_cfg: live.useCfg,
            stream_session: st.sid,
            stream_pipeline: true, // overlap device compute with the wire
          }),
        });
        const json = await resp.json();
        if (resp.ok) {
          setResult(`data:image/jpeg;base64,${json.image}`);
          st.n += 1;
          const fps = st.n / ((performance.now() - st.t0) / 1000);
          setStatus(
            `streaming ${fps.toFixed(1)} fps (frame ${st.n}` +
              `${json.keyframe ? ", keyframe" : ""})`
          );
        } else if (resp.status === 429) {
          await new Promise((r) => setTimeout(r, 50)); // another client holds the chip
        } else {
          setStatus(`error ${resp.status}: ${json.detail || "unknown"}`);
          await new Promise((r) => setTimeout(r, 500));
        }
      } catch (e) {
        setStatus(`request failed: ${e}`);
        await new Promise((r) => setTimeout(r, 500));
      }
    }
  }, []);

  // Binary ws transport: TEXT frames carry JSON config (a mid-stream one
  // is a live prompt switch — the server re-freezes conditioning, keeps
  // the temporal latent); BINARY frames carry raw JPEG. Responses are
  // [4-byte meta length][meta JSON][jpeg bytes].
  const wsStop = useCallback(() => {
    const st = streamRef.current;
    if (st.ws) {
      const w = st.ws;
      st.ws = null;
      st.inflight = 0;
      w.close();
    }
  }, []);

  const wsFrame = useCallback(() => {
    const st = streamRef.current;
    if (!st.ws || st.ws.readyState !== 1 || !st.on || st.inflight >= 2)
      return;
    const video = webcamRef.current && webcamRef.current.video;
    if (!video || !video.videoWidth) {
      setTimeout(wsFrame, 100);
      return;
    }
    drawCrop(video, video.videoWidth, video.videoHeight).toBlob(
      (b) => {
        const s = streamRef.current;
        if (b && s.ws && s.ws.readyState === 1 && s.on) {
          s.ws.send(b);
          s.inflight += 1;
          wsFrame(); // fill the second in-flight slot
        }
      },
      "image/jpeg",
      0.9
    );
  }, []);

  const wsStart = useCallback(() => {
    const st = streamRef.current;
    const ws = new WebSocket(WS_URL);
    ws.binaryType = "arraybuffer";
    st.ws = ws;
    st.inflight = 0;
    ws.onopen = () => {
      const live = liveRef.current;
      ws.send(
        JSON.stringify({
          prompt: live.prompt,
          steps: live.steps,
          use_cfg: live.useCfg,
          pipeline: true,
        })
      );
      wsFrame();
    };
    ws.onmessage = (ev) => {
      if (typeof ev.data === "string") {
        const j = JSON.parse(ev.data); // ready/ok acks or errors
        if (j.status === "error") {
          setStatus(`ws error ${j.code}: ${j.detail || ""}`);
          // frame-level errors (429 busy etc.) consumed an in-flight
          // slot: release it and retry, else the stream stalls at 2
          if (j.frame && st.inflight > 0) {
            st.inflight -= 1;
            setTimeout(wsFrame, 300);
          }
        }
        return;
      }
      st.inflight -= 1;
      const dv = new DataView(ev.data);
      const n = dv.getUint32(0);
      const meta = JSON.parse(
        new TextDecoder().decode(new Uint8Array(ev.data, 4, n))
      );
      const url = URL.createObjectURL(
        new Blob([new Uint8Array(ev.data, 4 + n)], { type: "image/jpeg" })
      );
      setResult((old) => {
        if (old && old.startsWith("blob:")) URL.revokeObjectURL(old);
        return url;
      });
      st.n += 1;
      const fps = st.n / ((performance.now() - st.t0) / 1000);
      setStatus(
        `ws streaming ${fps.toFixed(1)} fps (frame ${st.n}` +
          `${meta.keyframe ? ", keyframe" : ""})`
      );
      wsFrame();
    };
    ws.onerror = () => {
      if (st.ws) {
        setStatus("ws failed — falling back to HTTP stream");
        wsStop();
        if (st.on) streamLoop();
      }
    };
    ws.onclose = () => {
      if (st.ws === ws) {
        st.ws = null;
        st.inflight = 0;
      }
    };
  }, [wsFrame, wsStop, streamLoop]);

  // live config switch mid-stream: one TEXT frame re-freezes the prompt
  // conditioning server-side while the temporal latent is kept
  useEffect(() => {
    const st = streamRef.current;
    if (st.ws && st.ws.readyState === 1) {
      st.ws.send(JSON.stringify({ prompt, steps, use_cfg: useCfg }));
    }
  }, [prompt, steps, useCfg]);

  const toggleStream = useCallback(
    (on) => {
      const st = streamRef.current;
      if (on === st.on) return;
      st.on = on;
      setStreaming(on);
      if (on) {
        st.sid = `react-${Math.random().toString(36).slice(2)}`;
        st.n = 0;
        st.t0 = performance.now();
        if (window.WebSocket) wsStart();
        else streamLoop();
      } else {
        wsStop();
        setStatus("idle");
      }
    },
    [streamLoop, wsStart, wsStop]
  );

  const onEdit = useCallback(() => {
    if (busy) return;
    if (tab === "webcam") {
      const video = webcamRef.current && webcamRef.current.video;
      if (!video || !video.videoWidth) {
        setStatus("webcam not ready");
        return;
      }
      submit(cropToSquare(video, video.videoWidth, video.videoHeight));
    } else {
      submit(uploadData);
    }
  }, [busy, tab, uploadData, submit]);

  return (
    <div style={styles.page}>
      <h2>Qwen-Image-Edit-2509 — TPU realtime editing</h2>
      <div>
        {["webcam", "upload", "composite"].map((t) => (
          <button
            key={t}
            style={styles.tab(tab === t)}
            onClick={() => {
              setTab(t);
              if (t !== "webcam") toggleStream(false);
            }}
          >
            {t[0].toUpperCase() + t.slice(1)}
          </button>
        ))}
      </div>
      <div style={styles.row}>
        <div style={styles.col}>
          {tab === "webcam" ? (
            <Webcam ref={webcamRef} audio={false} style={styles.media} />
          ) : (
            <div>
              <input
                type="file"
                accept="image/*"
                onChange={async (e) =>
                  e.target.files[0] &&
                  setUploadData(await fileToDataUrl(e.target.files[0]))
                }
              />
              {uploadData && (
                <img src={uploadData} alt="input" style={styles.media} />
              )}
            </div>
          )}
          {tab === "composite" && (
            <div>
              <label>
                Reference image:{" "}
                <input
                  type="file"
                  accept="image/*"
                  onChange={async (e) =>
                    e.target.files[0] &&
                    setRefData(await fileToDataUrl(e.target.files[0]))
                  }
                />
              </label>
              <label style={{ display: "block" }}>
                Blend: {blend.toFixed(2)}
                <input
                  type="range"
                  min="0"
                  max="1"
                  step="0.05"
                  value={blend}
                  onChange={(e) => setBlend(Number(e.target.value))}
                />
              </label>
            </div>
          )}
          <textarea
            style={{ width: "100%", minHeight: "3em", marginTop: 8 }}
            value={prompt}
            onChange={(e) => setPrompt(e.target.value)}
          />
          <label style={{ display: "block" }}>
            Steps: {steps}
            <input
              type="range"
              min="2"
              max="8"
              step="1"
              value={steps}
              onChange={(e) => setSteps(Number(e.target.value))}
            />
          </label>
          <label style={{ display: "block" }}>
            <input
              type="checkbox"
              checked={useCfg}
              onChange={(e) => setUseCfg(e.target.checked)}
            />{" "}
            CFG (higher quality, ~1.5× slower)
          </label>
          {tab === "webcam" && (
            <label style={{ display: "block" }}>
              <input
                type="checkbox"
                checked={streaming}
                onChange={(e) => toggleStream(e.target.checked)}
              />{" "}
              Stream (temporal session: keyframes re-anchor, in-between
              frames refine-only)
            </label>
          )}
          <button style={styles.button} onClick={onEdit} disabled={busy}>
            {busy ? "Processing…" : "Edit"}
          </button>
          <div style={{ color: "#666", marginTop: 8 }}>{status}</div>
        </div>
        <div style={styles.col}>
          {result ? (
            <img src={result} alt="result" style={styles.media} />
          ) : (
            <div style={{ ...styles.media, padding: "4em 0", textAlign: "center", color: "#999" }}>
              result appears here
            </div>
          )}
        </div>
      </div>
    </div>
  );
}
