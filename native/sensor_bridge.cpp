// sensor_bridge — native host-side sensor/actuation runtime.
//
// TPU-native equivalent of the reference's first-party C++ components, the
// Gazebo RealSense plugins (reference catkin_ws/realsense_gazebo_plugin/src/
// RealSensePlugin.cpp:242-276 and gazebo_ros_realsense.cpp:195-219): frame
// acquisition, depth unit conversion with range clipping, and delivery of
// the latest frame to the consumer.
//
// Components:
//  * FrameBuffer — a seqlock'd single-writer "latest frame" mailbox.  The
//    reference relies on a benign data race (ROS callbacks overwrite
//    latest_image while the control loop reads it, vitvs_v2.py:455-462);
//    here the same last-writer-wins semantics are race-free: readers retry
//    until they observe a consistent snapshot.
//  * depth conversions — float meters <-> uint16 millimeters with min/max
//    range clipping (DEPTH_SCALE_M = 0.001, RealSensePlugin.cpp:22).
//  * rgb8_to_unit_float / bilinear_resize_u8 — host-side pixel conversion
//    used by the io_bridge before device upload.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FrameBuffer {
  int width = 0;
  int height = 0;
  bool has_ir = false;            // stereo-IR planes allocated
  std::atomic<uint64_t> seq{0};   // even = stable, odd = write in progress
  std::atomic<uint64_t> stamp{0}; // monotonically increasing frame id
  std::vector<uint8_t> rgb;       // H*W*3
  std::vector<uint16_t> depth_mm; // H*W
  std::vector<uint8_t> ir1;       // H*W mono (left IR, L_INT8 wire format)
  std::vector<uint8_t> ir2;       // H*W mono (right IR)
};

// Shared writer body: the seqlock dance around the rgb/depth(/IR) copies.
void publish_impl(FrameBuffer* fb, const uint8_t* rgb, const float* depth_m,
                  const uint8_t* ir1, const uint8_t* ir2, float min_range_m,
                  float max_range_m) {
  const size_t n = static_cast<size_t>(fb->width) * fb->height;
  // -> odd: writing.  acq_rel RMW: the acquire half keeps the data writes
  // below from being reordered above the increment (a bare release would
  // only order PRECEDING writes and is insufficient here).
  fb->seq.fetch_add(1, std::memory_order_acq_rel);
  std::memcpy(fb->rgb.data(), rgb, n * 3);
  for (size_t i = 0; i < n; ++i) {
    const float d = depth_m[i];
    uint16_t mm = 0;
    if (d == d && d >= min_range_m && d <= max_range_m) {  // finite, in range
      mm = static_cast<uint16_t>(d * 1000.0f + 0.5f);      // DEPTH_SCALE_M
    }
    fb->depth_mm[i] = mm;
  }
  if (fb->has_ir && ir1 && ir2) {
    std::memcpy(fb->ir1.data(), ir1, n);
    std::memcpy(fb->ir2.data(), ir2, n);
  }
  fb->stamp.fetch_add(1, std::memory_order_relaxed);
  fb->seq.fetch_add(1, std::memory_order_release);  // -> even: stable
}

}  // namespace

extern "C" {

void* fb_create(int width, int height) {
  auto* fb = new FrameBuffer();
  fb->width = width;
  fb->height = height;
  fb->rgb.resize(static_cast<size_t>(width) * height * 3);
  fb->depth_mm.resize(static_cast<size_t>(width) * height);
  return fb;
}

// Like fb_create, but also allocates the two mono IR planes — the full
// four-sensor surface of the emulated RealSense (color, depth, 2x IR;
// RealSensePlugin.cpp:26-27 binds ired1/ired2 alongside color/depth).
void* fb_create_ir(int width, int height) {
  auto* fb = static_cast<FrameBuffer*>(fb_create(width, height));
  fb->has_ir = true;
  fb->ir1.resize(static_cast<size_t>(width) * height);
  fb->ir2.resize(static_cast<size_t>(width) * height);
  return fb;
}

void fb_destroy(void* h) { delete static_cast<FrameBuffer*>(h); }

// Producer: publish a frame (rgb HxWx3 uint8, depth HxW float meters).
// Depth is converted to uint16 mm with [min_range, max_range] clipping:
// out-of-range or non-finite readings become 0 ("no return"), matching the
// plugin's clipping behaviour.
void fb_publish(void* h, const uint8_t* rgb, const float* depth_m,
                float min_range_m, float max_range_m) {
  publish_impl(static_cast<FrameBuffer*>(h), rgb, depth_m, nullptr, nullptr,
               min_range_m, max_range_m);
}

// Producer with the stereo-IR pair (each HxW uint8 mono, L_INT8 wire
// format like the plugin's infra1/infra2 streams).  Requires fb_create_ir.
void fb_publish_ir(void* h, const uint8_t* rgb, const float* depth_m,
                   const uint8_t* ir1, const uint8_t* ir2, float min_range_m,
                   float max_range_m) {
  publish_impl(static_cast<FrameBuffer*>(h), rgb, depth_m, ir1, ir2,
               min_range_m, max_range_m);
}

// Consumer: copy the latest consistent frame.  Returns the frame stamp
// (0 if nothing was ever published).  depth is returned in float meters
// (0.0 where there was no return), ready for control.depth_at_points.
uint64_t fb_latest(void* h, uint8_t* rgb_out, float* depth_m_out) {
  auto* fb = static_cast<FrameBuffer*>(h);
  const size_t n = static_cast<size_t>(fb->width) * fb->height;
  uint64_t s0, s1 = 0, stamp = 0;
  do {
    s0 = fb->seq.load(std::memory_order_acquire);
    if (s0 & 1) {  // write in progress; force the retry check to fail
      s1 = s0 + 1;
      continue;
    }
    std::memcpy(rgb_out, fb->rgb.data(), n * 3);
    for (size_t i = 0; i < n; ++i) {
      depth_m_out[i] = fb->depth_mm[i] * 0.001f;
    }
    stamp = fb->stamp.load(std::memory_order_relaxed);
    // Canonical seqlock reader validation (Boehm, "Can seqlocks get along
    // with programming language memory models?"): the acquire FENCE keeps
    // the data loads above from sinking below the validation load — an
    // acquire load alone does not order PRECEDING loads, so on weakly-
    // ordered CPUs a torn frame could otherwise pass the s0==s1 check.
    std::atomic_thread_fence(std::memory_order_acquire);
    s1 = fb->seq.load(std::memory_order_relaxed);
  } while (s0 != s1);
  return stamp;
}

// Consumer for the full four-sensor frame; ir1_out/ir2_out each H*W uint8.
// Same seqlock validation as fb_latest.  Requires fb_create_ir.
uint64_t fb_latest_ir(void* h, uint8_t* rgb_out, float* depth_m_out,
                      uint8_t* ir1_out, uint8_t* ir2_out) {
  auto* fb = static_cast<FrameBuffer*>(h);
  if (!fb->has_ir) return 0;
  const size_t n = static_cast<size_t>(fb->width) * fb->height;
  uint64_t s0, s1 = 0, stamp = 0;
  do {
    s0 = fb->seq.load(std::memory_order_acquire);
    if (s0 & 1) {  // write in progress; force the retry check to fail
      s1 = s0 + 1;
      continue;
    }
    std::memcpy(rgb_out, fb->rgb.data(), n * 3);
    for (size_t i = 0; i < n; ++i) {
      depth_m_out[i] = fb->depth_mm[i] * 0.001f;
    }
    std::memcpy(ir1_out, fb->ir1.data(), n);
    std::memcpy(ir2_out, fb->ir2.data(), n);
    stamp = fb->stamp.load(std::memory_order_relaxed);
    std::atomic_thread_fence(std::memory_order_acquire);
    s1 = fb->seq.load(std::memory_order_relaxed);
  } while (s0 != s1);
  return stamp;
}

// float meters -> uint16 mm with range clip (standalone helper).
void depth_m_to_u16mm(const float* in, uint16_t* out, int64_t n,
                      float min_range_m, float max_range_m) {
  for (int64_t i = 0; i < n; ++i) {
    const float d = in[i];
    out[i] = (d == d && d >= min_range_m && d <= max_range_m)
                 ? static_cast<uint16_t>(d * 1000.0f + 0.5f)
                 : 0;
  }
}

// uint16 mm -> float meters; zero stays zero ("no return" -> later 100 m
// sentinel in the control law, reference vitvs_v2.py:582-584).
void depth_u16mm_to_m(const uint16_t* in, float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * 0.001f;
}

// interleaved uint8 RGB -> float32 [0,1], optionally normalized per channel.
void rgb8_to_unit_float(const uint8_t* in, float* out, int64_t npix,
                        const float* mean3, const float* std3) {
  const float inv = 1.0f / 255.0f;
  if (mean3 && std3) {
    const float m0 = mean3[0], m1 = mean3[1], m2 = mean3[2];
    const float r0 = 1.0f / std3[0], r1 = 1.0f / std3[1], r2 = 1.0f / std3[2];
    for (int64_t i = 0; i < npix; ++i) {
      out[i * 3 + 0] = (in[i * 3 + 0] * inv - m0) * r0;
      out[i * 3 + 1] = (in[i * 3 + 1] * inv - m1) * r1;
      out[i * 3 + 2] = (in[i * 3 + 2] * inv - m2) * r2;
    }
  } else {
    for (int64_t i = 0; i < npix * 3; ++i) out[i] = in[i] * inv;
  }
}

// Bilinear resize, uint8 interleaved RGB (half-pixel centres).
void bilinear_resize_u8(const uint8_t* in, int ih, int iw, uint8_t* out,
                        int oh, int ow) {
  const float sy = static_cast<float>(ih) / oh;
  const float sx = static_cast<float>(iw) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > ih - 2) y0 = ih - 2;
    const float wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > iw - 2) x0 = iw - 2;
      const float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float v00 = in[(y0 * iw + x0) * 3 + c];
        const float v01 = in[(y0 * iw + x0 + 1) * 3 + c];
        const float v10 = in[((y0 + 1) * iw + x0) * 3 + c];
        const float v11 = in[((y0 + 1) * iw + x0 + 1) * 3 + c];
        const float v = (v00 * (1 - wx) + v01 * wx) * (1 - wy)
                        + (v10 * (1 - wx) + v11 * wx) * wy;
        out[(y * ow + x) * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // extern "C"
