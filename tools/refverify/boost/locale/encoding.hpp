// minimal boost::locale::conv::to_utf shim via iconv (verification build only)
#ifndef BOOST_LOCALE_SHIM
#define BOOST_LOCALE_SHIM
#include <string>
#include <iconv.h>
#include <stdexcept>
#include <cerrno>
#include <cstring>
namespace boost { namespace locale { namespace conv {
template <class Char>
std::string to_utf(const std::string &in, const std::string &charset) {
  iconv_t cd = iconv_open("UTF-8", charset.c_str());
  if (cd == (iconv_t)-1) throw std::runtime_error("iconv_open failed: " + charset);
  std::string out;
  out.reserve(in.size() * 2);
  char buf[4096];
  char *src = const_cast<char*>(in.data());
  size_t srcLeft = in.size();
  while (srcLeft > 0) {
    char *dst = buf;
    size_t dstLeft = sizeof(buf);
    size_t r = iconv(cd, &src, &srcLeft, &dst, &dstLeft);
    out.append(buf, sizeof(buf) - dstLeft);
    if (r == (size_t)-1) {
      if (errno == E2BIG) continue;
      // skip invalid byte (boost default method: skip)
      if (srcLeft > 0) { ++src; --srcLeft; }
      else break;
    }
  }
  iconv_close(cd);
  return out;
}
template <class Char>
std::string to_utf(const std::string &in, const char *charset) {
  return to_utf<Char>(in, std::string(charset));
}
}}}
#endif
