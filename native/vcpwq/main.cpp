// CLI for the VC-PWQ-style codec: produces the reference's file contract
// (decoded "*_{b}.wav" + compressed "*_{b}.binary",
// reference: Evaluation/dac_vcpwq_proposed.py:550-597).
//
//   vcpwq_codec encode IN.wav OUT.binary B
//   vcpwq_codec decode IN.binary OUT.wav
//   vcpwq_codec batch  IN_DIR DEC_DIR COMP_DIR B   (all *.wav in IN_DIR)

#include <dirent.h>
#include <sys/stat.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace vcpwq {
std::vector<uint8_t> encode(const float*, uint32_t, uint32_t, uint32_t, uint32_t);
std::vector<uint8_t> encode_v2(const float*, uint32_t, uint32_t, uint32_t, uint32_t);
std::vector<float> decode(const uint8_t*, size_t);
}

// ------------------------------------------------------- minimal WAV IO

static bool read_wav(const std::string& path, std::vector<float>* x,
                     uint32_t* sr) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return false; }
  fclose(f);
  if (size < 44 || memcmp(buf.data(), "RIFF", 4) || memcmp(buf.data() + 8, "WAVE", 4))
    return false;

  uint16_t fmt = 0, channels = 1, bits = 16;
  long pos = 12;
  const uint8_t* data = nullptr;
  uint32_t data_size = 0;
  while (pos + 8 <= size) {
    uint32_t csize;
    memcpy(&csize, buf.data() + pos + 4, 4);
    if (!memcmp(buf.data() + pos, "fmt ", 4)) {
      memcpy(&fmt, buf.data() + pos + 8, 2);
      memcpy(&channels, buf.data() + pos + 10, 2);
      memcpy(sr, buf.data() + pos + 12, 4);
      memcpy(&bits, buf.data() + pos + 22, 2);
    } else if (!memcmp(buf.data() + pos, "data", 4)) {
      data = buf.data() + pos + 8;
      data_size = csize;
    }
    pos += 8 + csize + (csize & 1);
  }
  if (!data) return false;
  uint32_t frames;
  if (fmt == 1 && bits == 16) {
    frames = data_size / 2 / channels;
    x->resize(frames);
    const int16_t* p = reinterpret_cast<const int16_t*>(data);
    for (uint32_t i = 0; i < frames; ++i) (*x)[i] = p[i * channels] / 32768.0f;
  } else if (fmt == 3 && bits == 32) {
    frames = data_size / 4 / channels;
    x->resize(frames);
    const float* p = reinterpret_cast<const float*>(data);
    for (uint32_t i = 0; i < frames; ++i) (*x)[i] = p[i * channels];
  } else {
    return false;
  }
  return true;
}

static bool write_wav_f32(const std::string& path, const std::vector<float>& x,
                          uint32_t sr) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  uint32_t data_size = (uint32_t)(x.size() * 4);
  uint32_t riff = 4 + 8 + 16 + 8 + 4 + 4 + 8 + data_size;
  uint16_t fmt = 3, ch = 1, bits = 32;
  uint32_t byte_rate = sr * 4, fact_n = (uint32_t)x.size();
  uint16_t block = 4;
  fwrite("RIFF", 1, 4, f); fwrite(&riff, 4, 1, f); fwrite("WAVE", 1, 4, f);
  uint32_t fmt_size = 16;
  fwrite("fmt ", 1, 4, f); fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt, 2, 1, f); fwrite(&ch, 2, 1, f); fwrite(&sr, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f); fwrite(&block, 2, 1, f); fwrite(&bits, 2, 1, f);
  uint32_t fact_size = 4;
  fwrite("fact", 1, 4, f); fwrite(&fact_size, 4, 1, f); fwrite(&fact_n, 4, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_size, 4, 1, f);
  fwrite(x.data(), 4, x.size(), f);
  fclose(f);
  return true;
}

static bool write_blob(const std::string& path, const std::vector<uint8_t>& b) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  fwrite(b.data(), 1, b.size(), f);
  fclose(f);
  return true;
}

static std::string stem_of(const std::string& path) {
  size_t slash = path.find_last_of('/');
  std::string name = (slash == std::string::npos) ? path : path.substr(slash + 1);
  size_t dot = name.find_last_of('.');
  return (dot == std::string::npos) ? name : name.substr(0, dot);
}

static int do_encode(const std::string& in, const std::string& out, int b,
                     bool v1 = false) {
  std::vector<float> x;
  uint32_t sr = 0;
  if (!read_wav(in, &x, &sr)) { fprintf(stderr, "bad wav: %s\n", in.c_str()); return 1; }
  std::vector<uint8_t> enc =
      v1 ? vcpwq::encode(x.data(), (uint32_t)x.size(), sr, 512, (uint32_t)b)
         : vcpwq::encode_v2(x.data(), (uint32_t)x.size(), sr, 512, (uint32_t)b);
  if (!write_blob(out, enc)) return 1;
  return 0;
}

static int do_decode(const std::string& in, const std::string& out) {
  FILE* f = fopen(in.c_str(), "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return 1; }
  fclose(f);
  uint32_t sr;
  memcpy(&sr, buf.data() + 4, 4);
  std::vector<float> dec = vcpwq::decode(buf.data(), buf.size());
  if (dec.empty()) return 1;
  return write_wav_f32(out, dec, sr) ? 0 : 1;
}

int main(int argc, char** argv) {
  if (argc >= 5 && !strcmp(argv[1], "encode"))
    return do_encode(argv[2], argv[3], atoi(argv[4]),
                     argc >= 6 && !strcmp(argv[5], "v1"));
  if (argc >= 4 && !strcmp(argv[1], "decode"))
    return do_decode(argv[2], argv[3]);
  if (argc >= 6 && !strcmp(argv[1], "batch")) {
    std::string in_dir = argv[2], dec_dir = argv[3], comp_dir = argv[4];
    int b = atoi(argv[5]);
    bool v1 = argc >= 7 && !strcmp(argv[6], "v1");
    mkdir(dec_dir.c_str(), 0755);
    mkdir(comp_dir.c_str(), 0755);
    DIR* d = opendir(in_dir.c_str());
    if (!d) return 1;
    int n = 0;
    while (dirent* e = readdir(d)) {
      std::string name = e->d_name;
      if (name.size() < 4 || name.substr(name.size() - 4) != ".wav") continue;
      std::string in = in_dir + "/" + name;
      std::string stem = stem_of(name);
      char bstr[16];
      snprintf(bstr, sizeof(bstr), "_%d", b);
      std::string comp = comp_dir + "/" + stem + bstr + ".binary";
      std::string dec = dec_dir + "/" + stem + bstr + ".wav";
      if (do_encode(in, comp, b, v1) == 0 && do_decode(comp, dec) == 0) ++n;
    }
    closedir(d);
    printf("[vcpwq] coded %d files at b=%d\n", n, b);
    return 0;
  }
  fprintf(stderr,
          "usage: vcpwq_codec encode IN.wav OUT.binary B [v1]\n"
          "       vcpwq_codec decode IN.binary OUT.wav\n"
          "       vcpwq_codec batch IN_DIR DEC_DIR COMP_DIR B [v1]\n");
  return 2;
}
